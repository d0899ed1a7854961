"""Compatibility: torch (reference-format) checkpoint import."""

from msig_tpu.compat.torch_import import (  # noqa: F401
    import_discriminator,
    import_generator,
    import_style_encoder,
    load_torch_checkpoint_dir,
)
