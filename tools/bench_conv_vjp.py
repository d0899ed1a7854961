#!/usr/bin/env python
"""On-chip benchmark for the fused conv3x3 Pallas backward (VERDICT r4 #1).

Mode micro (default): one trunk site-call [B,64,64,256] — XLA's dgrad+wgrad
pair (via jax.vjp) vs ops/conv3x3_vjp.conv3x3_bwd. Reports ms/call and
effective TFLOP/s (the site is 9.66 GFLOP/img for dx+dW).

Mode step: the full b32/b8 train step with MSIG_CONV_VJP=0 vs 1 — run each
variant in its OWN process (the env gate is trace-time):

    python tools/bench_conv_vjp.py --mode micro [--batch 32]
    MSIG_CONV_VJP=0 python tools/bench_conv_vjp.py --mode step --batch 32
    MSIG_CONV_VJP=1 python tools/bench_conv_vjp.py --mode step --batch 32
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def _sync(x):
    import jax
    import jax.numpy as jnp

    return float(jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))(x))


def micro(batch, iters):
    import jax
    import jax.numpy as jnp

    from msig_tpu.ops.conv3x3_vjp import conv3x3_bwd

    H, C = 64, 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (batch, H, H, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)), jnp.bfloat16)
    dy = jnp.asarray(rng.normal(0, 1, (batch, H, H, C)), jnp.bfloat16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def xla_bwd(x, w, dy):
        _, vjp = jax.vjp(conv, x, w)
        return vjp(dy)

    gflop = batch * 2 * 9.66  # dx + dW, 4.83 GFLOP/img each
    for name, fn in (("xla dgrad+wgrad", lambda: xla_bwd(x, w, dy)),
                     ("pallas fused   ", lambda: conv3x3_bwd(x, w, dy))):
        out = fn()
        _sync(out[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        _sync(out[0])
        ms = 1000 * (time.perf_counter() - t0) / iters
        tflops = gflop / ms
        print(f"{name}: {ms:7.3f} ms/call  {tflops:6.1f} TFLOP/s "
              f"({100 * tflops / 197:.0f}% of v5e bf16 peak)", flush=True)


def step(batch, iters):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    ms = bench.bench_train(batch=batch, iters=iters)
    gate = os.environ.get("MSIG_CONV_VJP", "0")
    print(f"train step b{batch} (MSIG_CONV_VJP={gate}): {ms:.1f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["micro", "step"], default="micro")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    import msig_tpu

    msig_tpu.enable_persistent_compile_cache()
    if args.mode == "micro":
        micro(args.batch, args.iters)
    else:
        step(args.batch, max(args.iters, 5))


if __name__ == "__main__":
    main()
