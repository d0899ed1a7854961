"""Low-level compute ops: fused AdaIN, Gram matrices, image preprocessing."""

from msig_tpu.ops.norm import adain_modulate, instance_norm  # noqa: F401
from msig_tpu.ops.gram import gram_matrix  # noqa: F401
