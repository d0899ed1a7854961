"""Compatibility: torch (reference-format) checkpoint import/export."""

from msig_tpu.compat.torch_export import (  # noqa: F401
    export_discriminator,
    export_generator,
    export_style_encoder,
    save_torch_checkpoint_dir,
)
from msig_tpu.compat.torch_import import (  # noqa: F401
    import_discriminator,
    import_generator,
    import_style_encoder,
    load_torch_checkpoint_dir,
)
