#!/usr/bin/env python
"""enc1 site micro-bench: phase-packed (9 taps x K=256) vs dense im2col
(4 x K=1024, 2.25x fewer MACs — VERDICT r2 lever). Run on the TPU.

Usage: python tools/bench_enc1_im2col.py [B] [iters]
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msig_tpu.ops import fused_enc_int8 as fe


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    rng = np.random.default_rng(0)
    img = jax.device_put(
        rng.integers(0, 256, (b, 256, 256, 3)).astype(np.uint8))
    w0 = rng.integers(-32, 33, (7, 7, 3, 64)).astype(np.int8)
    w1 = rng.integers(-32, 33, (4, 4, 64, 128)).astype(np.int8)

    h0 = jax.jit(lambda im: fe.enc0_in_relu_requant(
        fe.prep_s2d4_input(im), fe.pack_enc0(w0)))(img)
    _sync(h0)
    wa = jax.device_put(fe.pack_enc1(w1))
    wb = jax.device_put(fe.pack_enc1_im2col(w1))
    fa = jax.jit(lambda x, w: fe.enc1_in_relu_requant(x, w))
    fb = jax.jit(lambda x, w: fe.enc1_in_relu_requant_im2col(x, w))

    for name, fn, w in (("phase-packed", fa, wa), ("im2col", fb, wb)):
        out = fn(h0, w)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(h0, w)
        _sync(out)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"enc1 {name:13s} B={b}: {dt:7.2f} ms/batch")


if __name__ == "__main__":
    main()
