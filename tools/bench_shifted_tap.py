#!/usr/bin/env python
"""Hypothesis test: are sublane-misaligned tap loads the trunk's MXU gap?

The v2 conv3x3 site kernel issues 9 shifted-slice loads per chunk; the 6
with dx = +-1 are misaligned by one row (Mosaic relayouts each). Variant B
pre-builds two +-1-row-shifted copies of the slab in VMEM scratch (2
misaligned passes total) so all 36 tap loads become aligned.

Times ONE conv3x3+AdaIN+ReLU+requant site at B on real TPU, both variants.
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msig_tpu.ops import fused_conv_int8_v2 as f2
from msig_tpu.ops.fused_conv_int8_v2 import (
    GUARD, _stats_update_slim, _valid_mask,
)

B = int(os.environ.get("B", "256"))
W_IMG = 64
WP = W_IMG + 8
SROWS = W_IMG * WP
CHUNK = 16 * WP
CIN = 256
EPS = 1e-5


def _kernel_relu_shifted(x_ref, w_ref, g_ref, b_ref, o_ref, acc, xm, xp):
    n_chunks = SROWS // CHUNK
    valid = _valid_mask(CHUNK, WP, W_IMG)
    n = float(W_IMG * W_IMG)
    lo = GUARD - WP - 8
    rows = SROWS + 2 * WP + 16
    xm[pl.ds(0, rows), :] = x_ref[0, pl.ds(lo - 1, rows), :]
    xp[pl.ds(0, rows), :] = x_ref[0, pl.ds(lo + 1, rows), :]
    sums = jnp.zeros((1, CIN), jnp.float32)
    sumsq = jnp.zeros((1, CIN), jnp.float32)
    cmin = jnp.zeros((1, CIN), jnp.float32)
    cmax = jnp.zeros((1, CIN), jnp.float32)
    for c in range(n_chunks):
        start = GUARD + c * CHUNK
        yc = None
        for t, (dy, dx) in enumerate(
                (dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)):
            if dx == 0:
                lhs = x_ref[0, pl.ds(start + dy * WP, CHUNK), :]
            elif dx == 1:
                lhs = xp[pl.ds(start + dy * WP - lo, CHUNK), :]
            else:
                lhs = xm[pl.ds(start + dy * WP - lo, CHUNK), :]
            d = jax.lax.dot_general(
                lhs, w_ref[t * CIN:(t + 1) * CIN, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            yc = d if yc is None else yc + d
        acc[pl.ds(c * CHUNK, CHUNK), :] = yc
        sums, sumsq, cmin, cmax = _stats_update_slim(
            yc, valid, sums, sumsq, cmin, cmax)
    mean = sums / n
    var = jnp.maximum(sumsq / n - mean * mean, 0.0)
    g = g_ref[0, :, :].astype(jnp.float32)
    b = b_ref[0, :, :].astype(jnp.float32)
    a = g * jax.lax.rsqrt(var + EPS)
    d = b - mean * a
    hi = jnp.maximum(a * cmax, a * cmin) + d
    amax = jnp.max(jnp.maximum(hi, 0.0))
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    a2 = a * s
    d2 = d * s
    for c in range(n_chunks):
        xf = acc[pl.ds(c * CHUNK, CHUNK), :].astype(jnp.float32)
        y = jnp.minimum(jnp.maximum(xf * a2 + d2, 0.0), 127.0)
        q = jnp.round(y).astype(jnp.int8)
        o_ref[0, pl.ds(GUARD + c * CHUNK, CHUNK), :] = jnp.where(
            valid, q, jnp.int8(0))
    o_ref[0, pl.ds(0, GUARD), :] = jnp.zeros((GUARD, CIN), jnp.int8)
    o_ref[0, pl.ds(GUARD + SROWS, GUARD), :] = jnp.zeros((GUARD, CIN), jnp.int8)


def site_shifted(x_q, w_packed, gamma, beta):
    bsz, xrows, _ = x_q.shape
    rows = SROWS + 2 * WP + 16
    return pl.pallas_call(
        _kernel_relu_shifted,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, xrows, CIN), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_packed.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CIN), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CIN), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, xrows, CIN), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, xrows, CIN), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((SROWS, CIN), jnp.int32),
            pltpu.VMEM((rows, CIN), jnp.int8),
            pltpu.VMEM((rows, CIN), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x_q, w_packed, gamma[:, None, :], beta[:, None, :])


def _sync(x):
    np.asarray(jax.device_get(x.ravel()[0]))


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    rng = np.random.default_rng(0)
    xrows = SROWS + 2 * GUARD
    x = np.zeros((B, xrows, CIN), np.int8)
    body = rng.integers(-127, 128, (B, 64, 64, CIN), dtype=np.int8)
    v = np.zeros((B, 64, WP, CIN), np.int8)
    v[:, :, :64] = body
    x[:, GUARD:GUARD + SROWS] = v.reshape(B, SROWS, CIN)
    x = jax.device_put(x)
    w = jax.device_put(
        rng.integers(-127, 128, (9 * CIN, CIN), dtype=np.int8))
    gamma = jax.device_put(rng.normal(1, 0.1, (B, CIN)).astype(np.float32))
    beta = jax.device_put(rng.normal(0, 0.1, (B, CIN)).astype(np.float32))

    base = jax.jit(lambda *a: f2.conv3x3_adain_relu_requant(*a))
    shif = jax.jit(site_shifted)
    got_a = np.asarray(base(x, w, gamma, beta))
    got_b = np.asarray(shif(x, w, gamma, beta))
    diff = np.abs(got_a.astype(np.int32) - got_b.astype(np.int32))
    print(f"parity: max diff {diff.max()} (must be 0 — identical math)")
    print(f"B={B} one relu site:")
    print(f"  v2 baseline (6 misaligned taps/chunk): {timeit(base, x, w, gamma, beta):7.2f} ms")
    print(f"  shifted-scratch (all aligned)        : {timeit(shif, x, w, gamma, beta):7.2f} ms")


if __name__ == "__main__":
    main()
