"""Pallas TPU kernel: fused instance-norm + style modulation (AdaIN).

The hot op of the generator: 16 AdaIN applications per forward (8 residual
blocks x 2, reference model.py:38-55). The XLA path materializes float32
intermediates and runs the mean/variance reductions as separate HBM passes;
this kernel does everything in ONE VMEM residency per (batch, channel-tile):
load the [S, 128] spatial slab once, compute mean/var in registers (fp32),
normalize, scale/shift by the per-sample (gamma, beta), and write the result
— plus the saved (mean, rstd) statistics for the backward pass.

The custom VJP runs a second single-pass kernel producing dx / dgamma /
dbeta from the saved statistics (standard instance-norm gradient:
``dx = g*r*(dy - mean(dy) - xhat*mean(dy*xhat))``).

Supported when the channel count is a multiple of 128 and the spatial slab
fits VMEM; anything else falls back to the XLA path in msig_tpu.ops.norm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_MAX_SLAB_BYTES = 8 * 1024 * 1024  # per-buffer VMEM budget (double-buffered)


def supported(x: jax.Array) -> bool:
    if x.ndim != 4:
        return False
    b, h, w, c = x.shape
    if c % _LANES != 0:
        return False
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    slab = h * w * _LANES * x.dtype.itemsize
    if slab > _MAX_SLAB_BYTES:
        return False
    return jax.default_backend() in ("tpu", "axon", "cpu")


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _fwd_kernel(eps, x_ref, g_ref, b_ref, y_ref, m_ref, r_ref):
    # Per-sample vectors ride as [B, 1, C] so their (1, 1, 128) blocks meet
    # the TPU tiling rule (second-to-last block dim == full array dim).
    x = x_ref[0].astype(jnp.float32)  # [S, 128]
    m = jnp.mean(x, axis=0, keepdims=True)
    xc = x - m
    v = jnp.mean(xc * xc, axis=0, keepdims=True)
    r = jax.lax.rsqrt(v + eps)
    g = g_ref[0].astype(jnp.float32)  # [1, 128]
    b = b_ref[0].astype(jnp.float32)
    y_ref[0] = (xc * (r * g) + b).astype(y_ref.dtype)
    m_ref[0] = m
    r_ref[0] = r


def _bwd_kernel(x_ref, g_ref, m_ref, r_ref, dy_ref, dx_ref, dg_ref, db_ref):
    x = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    m = m_ref[0]  # [1, 128] fp32
    r = r_ref[0]
    xhat = (x - m) * r
    g = g_ref[0].astype(jnp.float32)
    db = jnp.sum(dy, axis=0, keepdims=True)
    dg = jnp.sum(dy * xhat, axis=0, keepdims=True)
    s = x.shape[0]
    dx = (g * r) * (dy - db / s - xhat * (dg / s))
    dx_ref[0] = dx.astype(dx_ref.dtype)
    dg_ref[0] = dg
    db_ref[0] = db


def _vec_spec():
    return pl.BlockSpec((1, 1, _LANES), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)


def _slab_spec(s):
    return pl.BlockSpec((1, s, _LANES), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)


def _call_fwd(x3, gamma, beta, eps):
    b, s, c = x3.shape
    grid = (b, c // _LANES)
    kernel = functools.partial(_fwd_kernel, eps)
    y, m, r = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_slab_spec(s), _vec_spec(), _vec_spec()],
        out_specs=[_slab_spec(s), _vec_spec(), _vec_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, c), x3.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(x3, gamma.reshape(b, 1, c), beta.reshape(b, 1, c))
    return y, m.reshape(b, c), r.reshape(b, c)


def _call_bwd(x3, gamma, mean, rstd, dy3):
    b, s, c = x3.shape
    grid = (b, c // _LANES)
    dx, dg, db = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[_slab_spec(s), _vec_spec(), _vec_spec(), _vec_spec(), _slab_spec(s)],
        out_specs=[_slab_spec(s), _vec_spec(), _vec_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, c), dy3.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        x3,
        gamma.reshape(b, 1, c),
        mean.reshape(b, 1, c),
        rstd.reshape(b, 1, c),
        dy3,
    )
    return dx, dg.reshape(b, c), db.reshape(b, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def adain_pallas(x, gamma, beta, eps: float = 1e-5):
    """gamma * IN(x) + beta over NHWC via the fused kernel."""
    y, _, _ = _fwd_impl(x, gamma, beta, eps)
    return y


def _fwd_impl(x, gamma, beta, eps):
    b, h, w, c = x.shape
    y3, mean, rstd = _call_fwd(
        x.reshape(b, h * w, c), gamma.astype(jnp.float32), beta.astype(jnp.float32), eps
    )
    return y3.reshape(b, h, w, c), mean, rstd


def _vjp_fwd(x, gamma, beta, eps):
    y, mean, rstd = _fwd_impl(x, gamma, beta, eps)
    return y, (x, gamma, mean, rstd)


def _vjp_bwd(eps, residuals, dy):
    x, gamma, mean, rstd = residuals
    b, h, w, c = x.shape
    dx3, dgamma, dbeta = _call_bwd(
        x.reshape(b, h * w, c),
        gamma.astype(jnp.float32),
        mean,
        rstd,
        dy.reshape(b, h * w, c),
    )
    return (
        dx3.reshape(b, h, w, c),
        dgamma.astype(gamma.dtype),
        dbeta.astype(gamma.dtype),
    )


adain_pallas.defvjp(_vjp_fwd, _vjp_bwd)
