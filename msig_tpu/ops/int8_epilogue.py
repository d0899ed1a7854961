"""Pallas TPU kernels: fused int8 conv epilogues for the quantized generator.

The int8 inference path (msig_tpu/infer/quantized.py) spends more HBM
bandwidth between the convolutions than inside them: each conv's int32
output goes through cast -> instance-norm stats -> modulate -> (relu |
residual add) -> per-sample amax -> round/clip -> int8, which XLA lowers as
several full HBM passes (~17-20 MB moved per 4 MB of conv output). These
kernels do the whole epilogue in ONE VMEM residency of the int32 slab:

  - :func:`adain_relu_requant`   — relu(gamma * IN(x) + beta) -> int8
    (resblock adain1 sites; gamma=1/beta=0 gives the plain IN+relu case);
  - :func:`adain_residual_requant` — h = (gamma * IN(x) + beta) + residual,
    emitting BOTH bf16 h (for the next residual) and int8 h (for the next
    conv) in one pass (resblock adain2 sites).

The per-sample scalar requant scale never needs to be correct in absolute
terms — the NEXT conv's following instance norm absorbs it exactly (see
infer/quantized.py) — but it must be uniform across channels, so the kernel
computes the true amax over its full [S, C] slab (elementwise math is done
twice, in registers, instead of storing an intermediate: HBM traffic drops
to read-4MB + write-1MB per site).

Supported when the full per-image slab fits VMEM (S*C*4 bytes <= 8 MB, i.e.
64x64x256 resblock activations at 256^2 inference); larger shapes fall back
to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_SLAB_BYTES = 8 * 1024 * 1024


def supported(shape, dtype_bytes: int = 4) -> bool:
    b, s, c = shape
    if c % 128 != 0:
        return False
    return s * c * dtype_bytes <= _MAX_SLAB_BYTES and jax.default_backend() in (
        "tpu",
        "axon",
        "cpu",
    )


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _norm_mod(x_i32, gamma, beta, eps):
    """fp32 stats + modulation of an int32 [S, C] slab; returns fp32 [S, C]."""
    x = x_i32.astype(jnp.float32)
    m = jnp.mean(x, axis=0, keepdims=True)
    xc = x - m
    v = jnp.mean(xc * xc, axis=0, keepdims=True)
    r = jax.lax.rsqrt(v + eps)
    return xc * (r * gamma) + beta


def _requant_from_amax(y, amax):
    scale = jnp.where(amax > 0, 127.0 / amax, 1.0)
    return jnp.clip(jnp.round(y * scale), -127.0, 127.0).astype(jnp.int8)


def _relu_kernel(eps, x_ref, g_ref, b_ref, o_ref):
    g = g_ref[0].astype(jnp.float32)  # [1, C]
    b = b_ref[0].astype(jnp.float32)
    y = jnp.maximum(_norm_mod(x_ref[0], g, b, eps), 0.0)
    o_ref[0] = _requant_from_amax(y, jnp.max(y))


def _residual_kernel(eps, x_ref, g_ref, b_ref, res_ref, h_ref, o_ref):
    g = g_ref[0].astype(jnp.float32)
    b = b_ref[0].astype(jnp.float32)
    h = _norm_mod(x_ref[0], g, b, eps) + res_ref[0].astype(jnp.float32)
    h_ref[0] = h.astype(h_ref.dtype)
    o_ref[0] = _requant_from_amax(h, jnp.max(jnp.abs(h)))


def _slab(s, c):
    return pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _vec(c):
    return pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def adain_relu_requant(x_i32, gamma, beta, eps: float = 1e-5):
    """[B,S,C] int32 conv output -> int8, fused IN+modulate+relu+requant."""
    b, s, c = x_i32.shape
    return pl.pallas_call(
        functools.partial(_relu_kernel, eps),
        grid=(b,),
        in_specs=[_slab(s, c), _vec(c), _vec(c)],
        out_specs=_slab(s, c),
        out_shape=jax.ShapeDtypeStruct((b, s, c), jnp.int8),
        interpret=_interpret(),
    )(x_i32, gamma.reshape(b, 1, c), beta.reshape(b, 1, c))


def adain_residual_requant(x_i32, gamma, beta, residual, eps: float = 1e-5):
    """(IN-modulated x) + residual -> (h bf16, h int8), one pass."""
    b, s, c = x_i32.shape
    h, o = pl.pallas_call(
        functools.partial(_residual_kernel, eps),
        grid=(b,),
        in_specs=[_slab(s, c), _vec(c), _vec(c), _slab(s, c)],
        out_specs=[_slab(s, c), _slab(s, c)],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, c), residual.dtype),
            jax.ShapeDtypeStruct((b, s, c), jnp.int8),
        ],
        # in 4MB + res 2MB + out 2MB+1MB, double-buffered, exceeds the 16MB
        # default scoped limit — raise it (v5e VMEM accommodates this).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x_i32, gamma.reshape(b, 1, c), beta.reshape(b, 1, c), residual)
    return h, o
