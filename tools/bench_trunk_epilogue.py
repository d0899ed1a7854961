#!/usr/bin/env python
"""Decompose the int8 trunk site's wall time on-chip (VERDICT r4 #5).

The trunk stands at ~61% MXU (docs/PERF.md); this harness measures where
the other ~39% goes by timing the stock conv1 (relu) site against
stripped variants of the SAME kernel body (bench-only, wrong numerics):

  full      stock _kernel_relu      (conv + stats + requant)
  nostats   stats pass stripped     (conv + requant with fixed affine)
  norq      requant pass stripped   (conv + stats, int8 = truncated acc)
  convonly  both stripped           (conv + trivial int8 store)

full-nostats = the per-chunk VPU stats tax; full-norq = the requant
pass tax; convonly = the conv+DMA floor. Run at 256^2 geometry:

    python tools/bench_trunk_epilogue.py [--batch 256] [--iters 30]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--w_img", type=int, default=64)
    args = ap.parse_args()

    import msig_tpu

    msig_tpu.enable_persistent_compile_cache()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from msig_tpu.ops import fused_conv_int8_v2 as f2

    eps = f2._EPS
    w_img = args.w_img
    wp, srows, chunk, n_chunks = f2.geometry(w_img)
    g = f2.guard_rows(w_img)
    cin = 256
    xrows = srows + 2 * g

    # ---- kernel variants (bodies forked from f2._kernel_relu) ----------
    def k_full(x_ref, w_ref, gm_ref, bt_ref, o_ref, acc):
        f2._kernel_relu(eps, cin, wp, w_img, srows, chunk, g,
                        x_ref, w_ref, gm_ref, bt_ref, o_ref, acc)

    def k_nostats(x_ref, w_ref, gm_ref, bt_ref, o_ref, acc):
        offs = [dy * wp + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        valid = f2._valid_mask(chunk, wp, w_img)
        for c in range(n_chunks):
            yc = f2._conv_chunk(x_ref, w_ref, cin, cin, g + c * chunk, offs, chunk)
            acc[pl.ds(c * chunk, chunk), :] = yc
        a2 = gm_ref[0, :, :].astype(jnp.float32) * 0.01
        d2 = bt_ref[0, :, :].astype(jnp.float32)
        for c in range(n_chunks):
            xf = acc[pl.ds(c * chunk, chunk), :].astype(jnp.float32)
            y = jnp.minimum(jnp.maximum(xf * a2 + d2, 0.0), 127.0)
            q = jnp.round(y).astype(jnp.int8)
            o_ref[0, pl.ds(g + c * chunk, chunk), :] = jnp.where(
                valid, q, jnp.int8(0))
        o_ref[0, pl.ds(0, g), :] = jnp.zeros((g, cin), jnp.int8)
        o_ref[0, pl.ds(g + srows, g), :] = jnp.zeros((g, cin), jnp.int8)

    def k_norq(x_ref, w_ref, gm_ref, bt_ref, o_ref, acc):
        offs = [dy * wp + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        valid = f2._valid_mask(chunk, wp, w_img)
        sums = jnp.zeros((1, cin), jnp.float32)
        sumsq = jnp.zeros((1, cin), jnp.float32)
        cmin = jnp.zeros((1, cin), jnp.float32)
        cmax = jnp.zeros((1, cin), jnp.float32)
        for c in range(n_chunks):
            yc = f2._conv_chunk(x_ref, w_ref, cin, cin, g + c * chunk, offs, chunk)
            acc[pl.ds(c * chunk, chunk), :] = yc
            sums, sumsq, cmin, cmax = f2._stats_update_slim(
                yc, valid, sums, sumsq, cmin, cmax)
        # keep the stats live via a cheap dependence; skip the affine pass
        bias = (sums[0, 0] + sumsq[0, 0] + cmin[0, 0] + cmax[0, 0]).astype(jnp.int32)
        for c in range(n_chunks):
            q = ((acc[pl.ds(c * chunk, chunk), :] + bias) >> 8).astype(jnp.int8)
            o_ref[0, pl.ds(g + c * chunk, chunk), :] = q
        o_ref[0, pl.ds(0, g), :] = jnp.zeros((g, cin), jnp.int8)
        o_ref[0, pl.ds(g + srows, g), :] = jnp.zeros((g, cin), jnp.int8)

    def k_convonly(x_ref, w_ref, gm_ref, bt_ref, o_ref, acc):
        offs = [dy * wp + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        for c in range(n_chunks):
            yc = f2._conv_chunk(x_ref, w_ref, cin, cin, g + c * chunk, offs, chunk)
            acc[pl.ds(c * chunk, chunk), :] = yc
        for c in range(n_chunks):
            q = (acc[pl.ds(c * chunk, chunk), :] >> 8).astype(jnp.int8)
            o_ref[0, pl.ds(g + c * chunk, chunk), :] = q
        o_ref[0, pl.ds(0, g), :] = jnp.zeros((g, cin), jnp.int8)
        o_ref[0, pl.ds(g + srows, g), :] = jnp.zeros((g, cin), jnp.int8)

    def build(kernel):
        def call(x_q, w_packed, gamma, beta):
            return pl.pallas_call(
                kernel,
                grid=(x_q.shape[0],),
                in_specs=[
                    pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((9 * cin, cin), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, cin), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, cin), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((x_q.shape[0], xrows, cin),
                                               jnp.int8),
                scratch_shapes=[pltpu.VMEM((srows, cin), jnp.int32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(x_q, w_packed, gamma[:, None, :], beta[:, None, :])

        return jax.jit(call)

    rng = np.random.default_rng(0)
    b = args.batch
    x = jnp.asarray(rng.integers(-127, 128, (b, xrows, cin), dtype=np.int8))
    w = jnp.asarray(rng.integers(-32, 33, (9 * cin, cin), dtype=np.int8))
    gm = jnp.asarray(rng.normal(1, 0.3, (b, cin)).astype(np.float32))
    bt = jnp.asarray(rng.normal(0, 0.3, (b, cin)).astype(np.float32))

    sync = jax.jit(lambda a: jnp.sum(a.astype(jnp.int32)))

    results = {}
    for name, kern in (("full", k_full), ("nostats", k_nostats),
                       ("norq", k_norq), ("convonly", k_convonly)):
        fn = build(kern)
        out = fn(x, w, gm, bt)
        float(sync(out))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(x, w, gm, bt)
        float(sync(out))
        ms = 1000 * (time.perf_counter() - t0) / args.iters
        results[name] = ms
        us_img = 1000 * ms / b
        # conv MACs per site-call: B * srows-body * 9 * C * C
        tops = b * w_img * w_img * 9 * cin * cin * 2 / (ms / 1000) / 1e12
        print(f"{name:9s}: {ms:7.3f} ms  {us_img:6.2f} us/img "
              f"({tops:5.1f} TOPS eff)", flush=True)

    f = results
    print(f"\nstats tax   : {f['full'] - f['nostats']:.3f} ms "
          f"({100 * (f['full'] - f['nostats']) / f['full']:.1f}% of full)")
    print(f"requant tax : {f['full'] - f['norq']:.3f} ms "
          f"({100 * (f['full'] - f['norq']) / f['full']:.1f}% of full)")
    print(f"epilogue    : {f['full'] - f['convonly']:.3f} ms "
          f"({100 * (f['full'] - f['convonly']) / f['full']:.1f}% of full)")


if __name__ == "__main__":
    main()
