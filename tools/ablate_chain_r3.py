#!/usr/bin/env python
"""In-chain marginal cost of each stage of the all-Pallas int8 path.

Times jit'd PREFIXES of the real serving program (prep -> enc0 -> enc1 ->
enc2 -> trunk -> up0 -> up1 -> final7 -> border fix) and differences them,
so each stage's number includes exactly the HBM traffic and overlap it has
in the shipping program — unlike standalone stage timing, which adds a
~3.5 ms dispatch round trip per measurement through the tunneled runtime.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msig_tpu.infer.quantized import (
    _fused_trunk_rows, quantize_generator_params,
)
from msig_tpu.models import StyleCycleGANGenerator
from msig_tpu.ops import fused_conv_int8_v2 as f2
from msig_tpu.ops import fused_dec_int8 as fd
from msig_tpu.ops import fused_enc_int8 as fe

SIZE = int(os.environ.get("SIZE", "256"))   # 256 or 512
B = int(os.environ.get("B", "256" if SIZE == 256 else "32"))
W_CELLS = SIZE // 4
N_RES = 8


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, iters=10, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    gen = StyleCycleGANGenerator(style_dim=256, n_residual_blocks=N_RES,
                                 dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16)
    params = gen.init(jax.random.PRNGKey(0), img0, jnp.zeros((1, 256), jnp.bfloat16))
    q = quantize_generator_params(params, N_RES)

    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 256, (B, SIZE, SIZE, 3), dtype=np.uint8))
    style = jax.device_put(rng.normal(0, 1, (B, 256)).astype(np.float32))

    def upto(n):
        def f(im, st):
            h = fe.prep_s2d4_input(im)
            if n == 0:
                return h
            h = fe.enc0_in_relu_requant(h, q["enc0_p"], w_cells=W_CELLS)
            if n == 1:
                return h
            h = fe.enc1_in_relu_requant(h, q["enc1_p"], w_cells=W_CELLS)
            if n == 2:
                return h
            h, inv_s = fe.enc2_in_relu_requant(h, q["enc2_p"], w_cells=W_CELLS)
            hs = inv_s.reshape(im.shape[0], 1)
            if n == 3:
                return h
            h = _fused_trunk_rows(q, h, hs, st, N_RES, w_img=W_CELLS)
            if n == 4:
                return h
            y0, _ = f2.convt4x4s2_in_relu_requant_ps(
                h, q["up0_ps"], f2.PS_TAPS, W_CELLS, guarded_out=True)
            if n == 5:
                return y0
            if W_CELLS > 64:
                y1, inv_s1 = fd.up1_s2d16_hbm(y0, q["up1_s16"], w_cells=W_CELLS)
            else:
                y1, inv_s1 = fd.up1_s2d16(y0, q["up1_s16"])
            if n == 6:
                return y1
            u8 = fd.final7_tanh_u8(y1, q["final_s16"], q["out_wscale"],
                                   q["out_bias"], inv_s1, w_cells=W_CELLS)
            if n == 7:
                return u8
            return fd.unphase_s2d16_u8(u8, w_cells=W_CELLS)
        return jax.jit(f)

    names = ["prep s2d4", "enc0", "enc1", "enc2", "trunk(16 sites)",
             "up0", "up1(+guards)", "final7", "unphase"]
    prev = 0.0
    print(f"SIZE={SIZE} B={B} in-chain prefix ablation:")
    for n, name in enumerate(names):
        t = timeit(upto(n), img, style)
        print(f"  +{name:<18}: cum {t:8.2f} ms   marginal {t - prev:7.2f} ms"
              f"  ({(t - prev) / B * 1000:6.1f} us/img)")
        prev = t
    print(f"  total {prev:.2f} ms -> {B / prev * 1000:.0f} img/s")


if __name__ == "__main__":
    main()
