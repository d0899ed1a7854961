"""Instance normalization and AdaIN modulation (the hot op).

The reference applies ``nn.InstanceNorm2d(affine=False)`` followed by a
per-style affine (gamma, beta) produced by a linear layer
(/root/reference/model.py:16-36). Here both fuse into one op over NHWC
feature maps: statistics are computed per (batch, channel) over the spatial
axes in float32 (GAN-critical precision even when convs run bfloat16), then
the normalized activations are modulated in a single vectorized pass.

Two execution paths share this API:
  - the XLA path below (always available, CPU/TPU) — XLA fuses the
    normalize+modulate elementwise chain into the surrounding convs;
  - a Pallas TPU kernel (:mod:`msig_tpu.ops.adain_pallas`) that does the
    reduction + modulation in one VMEM pass, selected with ``use_pallas=True``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-5  # matches torch nn.InstanceNorm2d default eps


def instance_norm(x: jax.Array, eps: float = _EPS) -> jax.Array:
    """Instance norm without affine over NHWC: per-(B,C) spatial statistics.

    Uses biased variance (torch InstanceNorm2d semantics). Statistics in fp32.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y.astype(x.dtype)


def _adain_xla(x: jax.Array, gamma: jax.Array, beta: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    g = gamma.astype(jnp.float32)[:, None, None, :]
    b = beta.astype(jnp.float32)[:, None, None, :]
    # gamma * (x - mean) * inv + beta, folded into one scale + one shift
    scale = g * inv
    shift = b - mean * scale
    return (xf * scale + shift).astype(x.dtype)


def adain_modulate(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    eps: float = _EPS,
    use_pallas: bool = False,
) -> jax.Array:
    """Fused instance-norm + per-style affine: ``gamma * IN(x) + beta``.

    Args:
      x: content features ``[B, H, W, C]``.
      gamma: per-sample scale ``[B, C]`` (from the style-modulation linear).
      beta: per-sample shift ``[B, C]``.
      eps: instance-norm epsilon (1e-5 = torch default).
      use_pallas: route through the Pallas TPU kernel when supported.
    """
    if use_pallas:
        from msig_tpu.ops import adain_pallas

        if adain_pallas.supported(x):
            return adain_pallas.adain_pallas(x, gamma, beta, eps=eps)
    return _adain_xla(x, gamma, beta, eps)
