"""Chunked two-phase Pallas epilogue: IN/AdaIN + ReLU + requant from int32.

Second-generation kernel after the whole-slab variant in int8_epilogue.py
measured slower than XLA (one 4 MB block per program could not pipeline).
This version runs a (B, 2, S/CHUNK) grid of small blocks that Mosaic
double-buffers:

  phase 0 (per chunk): accumulate per-channel sum / sum-of-squares and the
      per-channel min / max of the raw int32 conv output into VMEM scratch;
      on the last chunk, finalize the instance-norm statistics AND the exact
      per-sample amax of the ReLU'd modulated output — possible WITHOUT a
      third pass because the modulation is a per-channel monotone affine
      map, so its spatial extremes are the images of the raw extremes:
      ``max_s relu(a_c * x + d_c) = relu(max(a_c * gmax_c, a_c * gmin_c) + d_c)``.
  phase 1 (per chunk): normalize, modulate, ReLU, scale by 127/amax,
      round/clip, write int8.

HBM traffic: 2 reads of the int32 slab + 1 int8 write (~9 MB per 4 MB conv
output) versus the XLA chain's measured ~3x that (profiler:
convert_reduce + abs_reduce + clamp_convert fusions dominate the int8
generator's runtime).

Variance uses E[x^2] - E[x]^2 in fp32 — safe here because conv outputs are
approximately zero-mean (random-sign accumulations), verified against the
two-pass XLA path in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def supported(shape) -> bool:
    b, s, c = shape
    if c % _LANES != 0 or s % 8 != 0:
        return False
    return jax.default_backend() in ("tpu", "axon", "cpu")


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _kernel(eps, n_chunks, chunk, total_s,
            x_ref, g_ref, b_ref, o_ref,
            acc_sum, acc_sq, acc_min, acc_max, stats):
    ph = pl.program_id(1)
    s_idx = pl.program_id(2)
    x = x_ref[0].astype(jnp.float32)  # [CHUNK, C]

    @pl.when(ph == 0)
    def _phase0():
        @pl.when(s_idx == 0)
        def _init():
            acc_sum[:] = jnp.zeros_like(acc_sum)
            acc_sq[:] = jnp.zeros_like(acc_sq)
            acc_min[:] = jnp.full_like(acc_min, jnp.inf)
            acc_max[:] = jnp.full_like(acc_max, -jnp.inf)

        acc_sum[:] = acc_sum[:] + jnp.sum(x, axis=0, keepdims=True)
        acc_sq[:] = acc_sq[:] + jnp.sum(x * x, axis=0, keepdims=True)
        acc_min[:] = jnp.minimum(acc_min[:], jnp.min(x, axis=0, keepdims=True))
        acc_max[:] = jnp.maximum(acc_max[:], jnp.max(x, axis=0, keepdims=True))

        @pl.when(s_idx == n_chunks - 1)
        def _finalize():
            m = acc_sum[:] / total_s
            var = jnp.maximum(acc_sq[:] / total_s - m * m, 0.0)
            r = jax.lax.rsqrt(var + eps)
            g = g_ref[0].astype(jnp.float32)
            bb = b_ref[0].astype(jnp.float32)
            a = r * g                      # per-channel scale
            d = bb - m * a                 # per-channel shift
            # exact spatial max of relu(a*x + d) from the raw extremes
            hi = jnp.maximum(a * acc_max[:], a * acc_min[:]) + d
            amax = jnp.max(jnp.maximum(hi, 0.0))
            stats[0, :] = a[0]
            stats[1, :] = d[0]
            stats[2, :] = jnp.full((a.shape[1],), jnp.where(amax > 0, 127.0 / amax, 1.0))

    @pl.when(ph == 1)
    def _phase1():
        a = stats[0, :][None, :]
        d = stats[1, :][None, :]
        scale = stats[2, 0]
        y = jnp.maximum(x * a + d, 0.0) * scale
        o_ref[0] = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def adain_relu_requant_chunked(x_i32, gamma, beta, eps: float = 1e-5, chunk: int = 512):
    """[B,S,C] int32 -> int8 via the chunked two-phase fused epilogue."""
    b, s, c = x_i32.shape
    chunk = min(chunk, s)
    while s % chunk != 0:
        chunk //= 2
    n_chunks = s // chunk
    kernel = functools.partial(_kernel, eps, n_chunks, chunk, float(s))
    return pl.pallas_call(
        kernel,
        grid=(b, 2, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, c), lambda i, p, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, p, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, p, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, chunk, c), lambda i, p, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, c), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),  # sum
            pltpu.VMEM((1, c), jnp.float32),  # sum of squares
            pltpu.VMEM((1, c), jnp.float32),  # per-channel min
            pltpu.VMEM((1, c), jnp.float32),  # per-channel max
            pltpu.VMEM((3, c), jnp.float32),  # finalized a / d / requant scale
        ],
        interpret=_interpret(),
    )(x_i32, gamma.reshape(b, 1, c), beta.reshape(b, 1, c))
