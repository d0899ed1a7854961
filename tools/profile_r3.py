#!/usr/bin/env python
"""Round-3 per-stage timing of the ALL-PALLAS int8 generator (B=128, 256²).

Produces the component budget of the ~80 ms/batch program behind the
1,601 img/s round-2 headline (BENCH_r02.json), so kernel work targets the
biggest slabs first. Stages follow msig_tpu/infer/quantized.py's
quantized_generator_apply fused path:

  prep(s2d4) -> enc0 -> enc1 -> enc2 -> trunk(16 sites) ->
  up0 -> unphase+pad -> up1 -> unphase -> final conv+tanh

Timing: every measurement fetches a scalar readback of the output —
on this platform `jax.block_until_ready` returns before execution
completes (docs/PERF.md "Measurement methodology fix").
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax


def _enable_jax_cache():
    d = os.environ["JAX_COMPILATION_CACHE_DIR"]
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_enable_jax_cache()
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msig_tpu.infer.quantized import (
    _conv_i8,
    _fused_decoder,
    _fused_trunk_rows,
    quantize_generator_params,
)
from msig_tpu.models import StyleCycleGANGenerator
from msig_tpu.ops import fused_conv_int8_v2 as f2
from msig_tpu.ops import fused_enc_int8 as fe

B = int(os.environ.get("B", "128"))
ITERS = int(os.environ.get("ITERS", "10"))


def _sync(x):
    """True device sync: fetch a scalar readback (block_until_ready lies)."""
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


def main():
    gen = StyleCycleGANGenerator(style_dim=256, n_residual_blocks=8, dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, 256, 256, 3), jnp.bfloat16)
    params = gen.init(jax.random.PRNGKey(0), img0, jnp.zeros((1, 256), jnp.bfloat16))
    q = quantize_generator_params(params, 8)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8))
    style = jnp.asarray(rng.normal(0, 1, (B, 256)).astype(np.float32))

    # ---- stage jits ------------------------------------------------------
    prep_j = jax.jit(fe.prep_s2d4_input)
    enc0_j = jax.jit(lambda s: fe.enc0_in_relu_requant(s, q["enc0_p"]))
    enc1_j = jax.jit(lambda s: fe.enc1_in_relu_requant(s, q["enc1_p"]))
    enc2_j = jax.jit(lambda s: fe.enc2_in_relu_requant(s, q["enc2_p"]))
    trunk_j = jax.jit(
        lambda hq, hs, st: _fused_trunk_rows(q, hq, hs, st, 8, w_img=64))
    up0_j = jax.jit(
        lambda hr: f2.convt4x4s2_in_relu_requant_ps(hr, q["up0_ps"], f2.PS_TAPS, 64))
    unph0_j = jax.jit(lambda y0: f2.to_padded_rows(f2.unphase_s2d(y0, 64, 128)))
    up1_j = jax.jit(
        lambda y0r: f2.convt4x4s2_in_relu_requant_ps(y0r, q["up1_ps"], f2.PS_TAPS, 128))
    # New fully-fused decoder tail (ops/fused_dec_int8.py)
    from msig_tpu.ops import fused_dec_int8 as fd

    up0g_j = jax.jit(lambda hr: f2.convt4x4s2_in_relu_requant_ps(
        hr, q["up0_ps"], f2.PS_TAPS, 64, guarded_out=True))
    up1s_j = jax.jit(lambda y0g: fd.up1_s2d16(y0g, q["up1_s16"]))
    fin_j = jax.jit(lambda yr, s: fd.unphase_s2d16_u8(fd.final7_tanh_u8(
        yr, q["final_s16"], q["out_wscale"], q["out_bias"], s)))

    def final(y1, inv_s):
        h64 = f2.unphase_s2d(y1, 128, 64)
        hi = jnp.pad(h64, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        y = _conv_i8(hi, q["out_kernel_i8"], 1, ((0, 0), (0, 0)))[..., :3]
        yf = y.astype(jnp.float32) * (
            q["out_wscale"][None, None, None, :3] * inv_s.reshape(B, 1, 1, 1))
        return jnp.tanh(yf + q["out_bias"][:3]).astype(jnp.bfloat16)

    final_j = jax.jit(final)
    dec_j = jax.jit(lambda hr: _fused_decoder(q, hr, jnp.bfloat16))
    dec_u8_j = jax.jit(lambda hr: _fused_decoder(q, hr, jnp.uint8))

    def full(img_u8, st, out_dtype=jnp.bfloat16):
        slab = fe.prep_s2d4_input(img_u8)
        h0 = fe.enc0_in_relu_requant(slab, q["enc0_p"])
        h1 = fe.enc1_in_relu_requant(h0, q["enc1_p"])
        hq, inv_s = fe.enc2_in_relu_requant(h1, q["enc2_p"])
        hr = _fused_trunk_rows(q, hq, inv_s.reshape(img_u8.shape[0], 1), st, 8)
        return _fused_decoder(q, hr, out_dtype)

    full_j = jax.jit(full)
    full_u8_j = jax.jit(lambda i, s: full(i, s, jnp.uint8))

    # ---- build intermediates --------------------------------------------
    slab = prep_j(img)
    h0 = enc0_j(slab)
    h1 = enc1_j(h0)
    hq, inv_s = enc2_j(h1)
    hs = inv_s.reshape(B, 1)
    hr = trunk_j(hq, hs, style)
    y0, _ = up0_j(hr)
    y0r = unph0_j(y0)
    y1, s1 = up1_j(y0r)
    y0g, _ = up0g_j(hr)
    y1s, s1s = up1s_j(y0g)

    stages = [
        ("prep s2d4 (XLA)", lambda: timeit(prep_j, img)),
        ("enc0 kernel", lambda: timeit(enc0_j, slab)),
        ("enc1 kernel", lambda: timeit(enc1_j, h0)),
        ("enc2 kernel", lambda: timeit(enc2_j, h1)),
        ("trunk (default)", lambda: timeit(trunk_j, hq, hs, style)),
        ("  up0 kernel (ps)", lambda: timeit(up0_j, hr)),
        ("  unphase0+pad (XLA)", lambda: timeit(unph0_j, y0)),
        ("  up1 kernel (ps)", lambda: timeit(up1_j, y0r)),
        ("  final conv+tanh (XLA)", lambda: timeit(final_j, y1, s1)),
        ("up0 kernel (guarded)", lambda: timeit(up0g_j, hr)),
        ("up1-on-s2d kernel", lambda: timeit(up1s_j, y0g)),
        ("final7+unph+borders", lambda: timeit(fin_j, y1s, s1s)),
    ]
    total = 0.0
    for name, f in stages:
        ms = f()
        if not name.startswith("  "):
            total += ms
        print(f"{name:26s}: {ms:7.2f} ms  ({1000 * ms / B:5.1f} us/img)", flush=True)
    print(f"{'sum of stages':26s}: {total:7.2f} ms -> {B / total * 1000:.0f} img/s")
    dec = timeit(dec_j, hr)
    print(f"{'decoder r2 (one jit)':26s}: {dec:7.2f} ms")
    dec8 = timeit(dec_u8_j, hr)
    print(f"{'decoder u8 (one jit)':26s}: {dec8:7.2f} ms")
    fullt = timeit(full_j, img, style)
    print(f"{'FULL bf16-out (one jit)':26s}: {fullt:7.2f} ms -> {B / fullt * 1000:.0f} img/s")
    fullt8 = timeit(full_u8_j, img, style)
    print(f"{'FULL u8-out (one jit)':26s}: {fullt8:7.2f} ms -> {B / fullt8 * 1000:.0f} img/s")


if __name__ == "__main__":
    main()
