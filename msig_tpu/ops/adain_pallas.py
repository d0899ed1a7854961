"""Pallas TPU kernel: fused instance-norm + style modulation (placeholder).

Real kernel lands in a later milestone; until then ``supported`` returns
False so :func:`msig_tpu.ops.norm.adain_modulate` uses the XLA path.
"""

from __future__ import annotations

import jax


def supported(x: jax.Array) -> bool:
    return False


def adain_pallas(x, gamma, beta, *, eps: float = 1e-5):
    raise NotImplementedError("Pallas AdaIN kernel not yet implemented")
