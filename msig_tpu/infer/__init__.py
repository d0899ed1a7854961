"""Inference: batched jit engine + style-sampling modes."""

from msig_tpu.infer.engine import InferenceEngine  # noqa: F401
from msig_tpu.infer.styles import STYLE_MODES, sample_styles  # noqa: F401
