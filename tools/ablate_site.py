#!/usr/bin/env python
"""Phase ablation of one fused trunk conv site at B=128 (v2 layout).

Times three kernel variants to split a site's cost into conv / stats /
requant phases, deciding whether a 2-sample interleave (overlap sample
s1's MXU conv under s0's VPU requant) is worth building:

  conv-only      : 9 tap matmuls, int8-truncate store (no stats, no P2)
  conv+stats     : adds the in-loop stats (sum/sumsq/min/max), no P2
  full (shipping): conv3x3_adain_relu_requant
  paired (2/step): conv+stats of BOTH samples first, then both requant
                   passes — exposes s1's conv stream for dual-issue with
                   s0's epilogue if Mosaic schedules across them.
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax


def _cache():
    d = os.environ["JAX_COMPILATION_CACHE_DIR"]
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_cache()
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msig_tpu.ops import fused_conv_int8 as fc
from msig_tpu.ops import fused_conv_int8_v2 as f2

B = int(os.environ.get("B", "128"))
ITERS = int(os.environ.get("ITERS", "10"))
CIN = 256
W_IMG = 64
EPS = 1e-5


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def timeit(fn, *args, iters=ITERS, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return 1000 * (time.perf_counter() - t0) / iters


def _kernel_ablate(mode, cin, wp, w_img, srows, chunk, guard,
                   x_ref, w_ref, g_ref, b_ref, o_ref, acc):
    n_chunks = srows // chunk
    offs = [dy * wp + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    valid = f2._valid_mask(chunk, wp, w_img)
    n = float(w_img * w_img)
    sums = jnp.zeros((1, cin), jnp.float32)
    sumsq = jnp.zeros((1, cin), jnp.float32)
    cmin = jnp.zeros((1, cin), jnp.float32)
    cmax = jnp.zeros((1, cin), jnp.float32)
    for c in range(n_chunks):
        yc = f2._conv_chunk(x_ref, w_ref, cin, cin, guard + c * chunk, offs, chunk)
        acc[pl.ds(c * chunk, chunk), :] = yc
        if mode == "conv":
            # minimal consumer so the conv isn't DCE'd
            o_ref[0, pl.ds(guard + c * chunk, chunk), :] = (
                yc & 127).astype(jnp.int8)
        else:
            sums, sumsq, cmin, cmax = f2._stats_update_slim(
                yc, valid, sums, sumsq, cmin, cmax)

    if mode == "conv":
        return
    mean = sums / n
    var = jnp.maximum(sumsq / n - mean * mean, 0.0)
    a = g_ref[0, :, :].astype(jnp.float32) * jax.lax.rsqrt(var + eps_c(EPS))
    d = b_ref[0, :, :].astype(jnp.float32) - mean * a
    hi = jnp.maximum(a * cmax, a * cmin) + d
    amax = jnp.max(jnp.maximum(hi, 0.0))
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    a2, d2 = a * s, d * s
    if mode == "stats":
        # consume the stats without the acc re-read pass
        o_ref[0, pl.ds(0, 8), :] = jnp.broadcast_to(
            jnp.clip(a2 + d2, -127, 127), (8, cin)).astype(jnp.int8)
        return
    for c in range(n_chunks):
        xf = acc[pl.ds(c * chunk, chunk), :].astype(jnp.float32)
        y = jnp.minimum(jnp.maximum(xf * a2 + d2, 0.0), 127.0)
        o_ref[0, pl.ds(guard + c * chunk, chunk), :] = jnp.where(
            valid, jnp.round(y).astype(jnp.int8), jnp.int8(0))


def eps_c(v):
    return v


def call_ablate(mode, x_q, w_packed, gamma, beta, chunk_rows=16):
    wp, srows, chunk, _ = f2.geometry(W_IMG, chunk_rows)
    g = f2.guard_rows(W_IMG)
    bsz, xrows, cin = x_q.shape
    kernel = functools.partial(_kernel_ablate, mode, cin, wp, W_IMG, srows,
                               chunk, g)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, xrows, cin), jnp.int8),
        scratch_shapes=[pltpu.VMEM((srows, cin), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(x_q, w_packed, gamma[:, None, :], beta[:, None, :])


def _kernel_pair(cin, wp, w_img, srows, chunk, guard,
                 x_ref, w_ref, g_ref, b_ref, o_ref, acc0, acc1):
    """Two samples per grid step: both conv+stats phases, then both
    requant phases — giving the scheduler an MXU stream (s1 conv) to
    dual-issue under s0's VPU-heavy epilogue."""
    n_chunks = srows // chunk
    offs = [dy * wp + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    valid = f2._valid_mask(chunk, wp, w_img)
    n = float(w_img * w_img)

    stats = []
    for s, accs in ((0, acc0), (1, acc1)):
        sums = jnp.zeros((1, cin), jnp.float32)
        sumsq = jnp.zeros((1, cin), jnp.float32)
        cmin = jnp.zeros((1, cin), jnp.float32)
        cmax = jnp.zeros((1, cin), jnp.float32)
        for c in range(n_chunks):
            yc = f2._conv_chunk(x_ref, w_ref, cin, cin,
                                s * (srows + 2 * guard) + guard + c * chunk,
                                offs, chunk)
            accs[pl.ds(c * chunk, chunk), :] = yc
            sums, sumsq, cmin, cmax = f2._stats_update_slim(
                yc, valid, sums, sumsq, cmin, cmax)
        mean = sums / n
        var = jnp.maximum(sumsq / n - mean * mean, 0.0)
        a = g_ref[0, s, :].astype(jnp.float32) * jax.lax.rsqrt(var + EPS)
        d = b_ref[0, s, :].astype(jnp.float32) - mean * a
        hi = jnp.maximum(a * cmax, a * cmin) + d
        amax = jnp.max(jnp.maximum(hi, 0.0))
        sc = jnp.where(amax > 0, 127.0 / amax, 1.0)
        stats.append((a * sc, d * sc))

    for s, accs in ((0, acc0), (1, acc1)):
        a2, d2 = stats[s]
        for c in range(n_chunks):
            xf = accs[pl.ds(c * chunk, chunk), :].astype(jnp.float32)
            y = jnp.minimum(jnp.maximum(xf * a2 + d2, 0.0), 127.0)
            o_ref[0, pl.ds(s * (srows + 2 * guard) + guard + c * chunk,
                           chunk), :] = jnp.where(
                valid, jnp.round(y).astype(jnp.int8), jnp.int8(0))


def call_pair(x_q2, w_packed, gamma2, beta2, chunk_rows=16):
    """x_q2: [B/2, 2*(xrows), C] — two samples stacked along rows."""
    wp, srows, chunk, _ = f2.geometry(W_IMG, chunk_rows)
    g = f2.guard_rows(W_IMG)
    bsz2, xrows2, cin = x_q2.shape
    kernel = functools.partial(_kernel_pair, cin, wp, W_IMG, srows, chunk, g)
    return pl.pallas_call(
        kernel,
        grid=(bsz2,),
        in_specs=[
            pl.BlockSpec((1, xrows2, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, xrows2, cin), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz2, xrows2, cin), jnp.int8),
        scratch_shapes=[pltpu.VMEM((srows, cin), jnp.int32),
                        pltpu.VMEM((srows, cin), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(x_q2, w_packed, gamma2, beta2)


def main():
    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, (B, W_IMG, W_IMG, CIN), dtype=np.int8)
    xq = f2.to_padded_rows(jnp.asarray(x))
    w = rng.integers(-64, 65, (3, 3, CIN, CIN), dtype=np.int8)
    wp = fc.pack_weights(jnp.asarray(w))
    gamma = jnp.asarray(rng.normal(1, 0.3, (B, CIN)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.3, (B, CIN)).astype(np.float32))

    full_j = jax.jit(lambda xq: f2.conv3x3_adain_relu_requant(xq, wp, gamma, beta))
    conv_j = jax.jit(lambda xq: call_ablate("conv", xq, wp, gamma, beta))
    stat_j = jax.jit(lambda xq: call_ablate("stats", xq, wp, gamma, beta))
    ab_full_j = jax.jit(lambda xq: call_ablate("full", xq, wp, gamma, beta))

    xq2 = jnp.asarray(np.asarray(xq).reshape(B // 2, -1, CIN))
    g2 = gamma.reshape(B // 2, 2, CIN)
    b2 = beta.reshape(B // 2, 2, CIN)
    pair_j = jax.jit(lambda xq2: call_pair(xq2, wp, g2, b2))

    for name, f, a in (("conv only", conv_j, xq),
                       ("conv+stats", stat_j, xq),
                       ("full (ablate build)", ab_full_j, xq),
                       ("full (shipping)", full_j, xq),
                       ("paired 2/step", pair_j, xq2)):
        print(f"{name:22s}: {timeit(f, a):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
