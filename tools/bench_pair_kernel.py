#!/usr/bin/env python
"""Experiment: 2 samples per program in the v2 relu-site kernel.

Hypothesis: within one program, sample A's fp32 epilogue (VPU) can overlap
sample B's conv matmuls (MXU) if both live in the same kernel body —
Mosaic schedules by dataflow, and the two samples are independent. If this
wins, the same restructure applies to all trunk/encoder/decoder kernels.
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import msig_tpu

    msig_tpu.enable_persistent_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from msig_tpu.ops import fused_conv_int8 as v1
    from msig_tpu.ops import fused_conv_int8_v2 as v2
    from msig_tpu.ops.fused_conv_int8_v2 import (
        GUARD, _conv_chunk, _valid_mask, geometry,
    )

    B = int(os.environ.get("B", "128"))
    EPS = 1e-5
    wp_, srows, chunk, n_chunks = geometry(64)
    offs = [dy * wp_ + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

    def kernel2(x_ref, w_ref, g_ref, b_ref, o_ref, acc0, acc1):
        valid = _valid_mask(chunk, wp_, 64)
        n = float(64 * 64)
        stats = []
        for s_idx, acc in ((0, acc0), (1, acc1)):
            sums = jnp.zeros((1, 256), jnp.float32)
            sumsq = jnp.zeros((1, 256), jnp.float32)
            cmin = jnp.full((1, 256), jnp.inf, jnp.float32)
            cmax = jnp.full((1, 256), -jnp.inf, jnp.float32)
            stats.append([sums, sumsq, cmin, cmax])
        # interleave the two samples' chunk matmuls + stats
        for c in range(n_chunks):
            for s_idx, acc in ((0, acc0), (1, acc1)):
                yc = None
                for t, off in enumerate(offs):
                    lhs = x_ref[s_idx, pl.ds(GUARD + c * chunk + off, chunk), :]
                    d = jax.lax.dot_general(
                        lhs, w_ref[t * 256:(t + 1) * 256, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    yc = d if yc is None else yc + d
                acc[pl.ds(c * chunk, chunk), :] = yc
                xf = jnp.where(valid, yc.astype(jnp.float32), 0.0)
                st = stats[s_idx]
                st[0] = st[0] + jnp.sum(xf, axis=0, keepdims=True)
                st[1] = st[1] + jnp.sum(xf * xf, axis=0, keepdims=True)
                xv = jnp.where(valid, yc.astype(jnp.float32), jnp.inf)
                st[2] = jnp.minimum(st[2], jnp.min(xv, axis=0, keepdims=True))
                xv = jnp.where(valid, yc.astype(jnp.float32), -jnp.inf)
                st[3] = jnp.maximum(st[3], jnp.max(xv, axis=0, keepdims=True))
        for s_idx, acc in ((0, acc0), (1, acc1)):
            sums, sumsq, cmin, cmax = stats[s_idx]
            mean = sums / n
            var = jnp.maximum(sumsq / n - mean * mean, 0.0)
            g = g_ref[s_idx, :, :].astype(jnp.float32)
            b = b_ref[s_idx, :, :].astype(jnp.float32)
            a = g * jax.lax.rsqrt(var + EPS)
            d = b - mean * a
            hi = jnp.maximum(a * cmax, a * cmin) + d
            amax = jnp.max(jnp.maximum(hi, 0.0))
            s = jnp.where(amax > 0, 127.0 / amax, 1.0)
            for c in range(n_chunks):
                xf = acc[pl.ds(c * chunk, chunk), :].astype(jnp.float32)
                y = jnp.maximum(xf * a + d, 0.0) * s
                q = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
                o_ref[s_idx, pl.ds(GUARD + c * chunk, chunk), :] = jnp.where(
                    valid, q, jnp.int8(0))
            o_ref[s_idx, pl.ds(0, GUARD), :] = jnp.zeros((GUARD, 256), jnp.int8)
            o_ref[s_idx, pl.ds(GUARD + srows, GUARD), :] = jnp.zeros(
                (GUARD, 256), jnp.int8)

    xrows = srows + 2 * GUARD

    def relu_site_2(x_q, w_packed, gamma, beta):
        bsz = x_q.shape[0]
        return pl.pallas_call(
            kernel2,
            grid=(bsz // 2,),
            in_specs=[
                pl.BlockSpec((2, xrows, 256), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9 * 256, 256), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1, 256), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1, 256), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, xrows, 256), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, xrows, 256), jnp.int8),
            scratch_shapes=[pltpu.VMEM((srows, 256), jnp.int32),
                            pltpu.VMEM((srows, 256), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x_q, w_packed, gamma[:, None, :], beta[:, None, :])

    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, (B, 64, 64, 256), dtype=np.int8)
    w = rng.integers(-32, 33, (3, 3, 256, 256), dtype=np.int8)
    wp = v1.pack_weights(jnp.asarray(w))
    gamma = jnp.asarray(rng.normal(1.0, 0.5, (B, 256)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0.0, 0.5, (B, 256)).astype(np.float32))
    x2 = v2.to_padded_rows(jnp.asarray(x))

    def sync(out):
        return float(jnp.sum(out[..., :1].astype(jnp.float32)))

    def timeit(f, *a, iters=15):
        for _ in range(3):
            sync(f(*a))
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            f(*a)
        sync(f(*a))
        return 1000 * (time.perf_counter() - t0) / iters

    f1 = jax.jit(lambda x, w, g, b: v2.conv3x3_adain_relu_requant(x, w, g, b, w_img=64))
    f2 = jax.jit(relu_site_2)

    # correctness vs 1-sample kernel
    a1 = np.asarray(f1(x2[:4], wp, gamma[:4], beta[:4]))
    a2 = np.asarray(f2(x2[:4], wp, gamma[:4], beta[:4]))
    same = np.array_equal(a1, a2)
    print(f"pair kernel == single kernel: {same}", flush=True)

    print(f"relu site 1-sample/program: {timeit(f1, x2, wp, gamma, beta):7.2f} ms", flush=True)
    print(f"relu site 2-sample/program: {timeit(f2, x2, wp, gamma, beta):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
