#!/usr/bin/env python
"""Shape-level timing of alternative formulations for the MXU-hostile convs."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def _enable_jax_cache():
    """The env var is not honored by this jax build; set the config flags.
    Must run after `import jax`, before the first compile."""
    import os as _os

    import jax as _jax

    d = _os.environ["JAX_COMPILATION_CACHE_DIR"]
    _os.makedirs(d, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", d)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


import jax

_enable_jax_cache()
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("B", "128"))
_DN = ("NHWC", "HWIO", "NHWC")


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=10, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return 1000 * (time.perf_counter() - t0) / iters


def conv(x, w, stride=1, pad=((0, 0), (0, 0)), lhs_dilation=None):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, lhs_dilation=lhs_dilation,
        dimension_numbers=_DN, preferred_element_type=jnp.int32)


def main():
    rng = np.random.default_rng(0)

    def i8(*shape, lo=-64, hi=64):
        return jnp.asarray(rng.integers(lo, hi, shape, dtype=np.int8))

    cases = []

    # --- enc_conv0: 7x7 C3->64 @256^2 (current: reflect-padded input) ---
    x0 = i8(B, 262, 262, 3)
    w0 = i8(7, 7, 3, 64)
    cases.append(("enc0 current 7x7 c3->64", jax.jit(lambda x, w: conv(x, w)), x0, w0))
    # s2d formulation: [131,131,12] * [4,4,12,256]
    xs = i8(B, 131, 131, 12)
    ws = i8(4, 4, 12, 256)
    cases.append(("enc0 s2d 4x4 c12->256", jax.jit(lambda x, w: conv(x, w)), xs, ws))
    # C_in padded to 8
    x8 = i8(B, 262, 262, 8)
    w8 = i8(7, 7, 8, 64)
    cases.append(("enc0 pad cin8 7x7", jax.jit(lambda x, w: conv(x, w)), x8, w8))

    # --- enc_conv1 in s2d: 3x3 c256->128 @128^2 vs current 4x4 s2 ---
    xc1 = i8(B, 256, 256, 64)
    wc1 = i8(4, 4, 64, 128)
    cases.append(("enc1 current 4x4s2 c64", jax.jit(
        lambda x, w: conv(x, w, 2, ((1, 1), (1, 1)))), xc1, wc1))
    xs1 = i8(B, 128, 128, 256)
    ws1 = i8(3, 3, 256, 128)
    cases.append(("enc1 s2d 3x3 c256->128", jax.jit(
        lambda x, w: conv(x, w, 1, ((1, 1), (1, 1)))), xs1, ws1))

    # --- dec_up0: ConvT(4,2,1) 256->128, in 64^2 -> out 128^2 ---
    xd = i8(B, 64, 64, 256)
    wd = i8(4, 4, 256, 128)
    cases.append(("up0 current lhs_dilated", jax.jit(
        lambda x, w: conv(x, w, 1, ((2, 2), (2, 2)), (2, 2))), xd, wd))

    # 4 phase convs 2x2 + interleave
    wp = i8(2, 2, 256, 512)  # 4 phases x 128 fused along C_out

    @jax.jit
    def up0_phase(x, w):
        y = conv(x, w, 1, ((1, 0), (1, 0)))  # [B,64,64,512]
        b, h, ww_, c = y.shape
        y = y.reshape(b, h, ww_, 2, 2, 128)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
        return y.reshape(b, 2 * h, 2 * ww_, 128)

    cases.append(("up0 phase-conv+interleave", up0_phase, xd, wp))

    # phase conv without interleave (cost of conv alone)
    cases.append(("up0 phase-conv only", jax.jit(
        lambda x, w: conv(x, w, 1, ((1, 0), (1, 0)))), xd, wp))

    # --- dec_up1: ConvT(4,2,1) 128->64, in 128^2 -> out 256^2 ---
    xd1 = i8(B, 128, 128, 128)
    wd1 = i8(4, 4, 128, 64)
    cases.append(("up1 current lhs_dilated", jax.jit(
        lambda x, w: conv(x, w, 1, ((2, 2), (2, 2)), (2, 2))), xd1, wd1))
    wp1 = i8(2, 2, 128, 256)

    @jax.jit
    def up1_phase(x, w):
        y = conv(x, w, 1, ((1, 0), (1, 0)))
        b, h, ww_, c = y.shape
        y = y.reshape(b, h, ww_, 2, 2, 64)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
        return y.reshape(b, 2 * h, 2 * ww_, 64)

    cases.append(("up1 phase-conv+interleave", up1_phase, xd1, wp1))

    # --- final: 7x7 c64->3 @256^2 ---
    xf = i8(B, 262, 262, 64)
    wf = i8(7, 7, 64, 3)
    cases.append(("final current 7x7 c64->3", jax.jit(lambda x, w: conv(x, w)), xf, wf))
    wf8 = i8(7, 7, 64, 8)
    cases.append(("final pad cout8", jax.jit(lambda x, w: conv(x, w)), xf, wf8))
    wf128 = i8(7, 7, 64, 128)
    cases.append(("final pad cout128", jax.jit(lambda x, w: conv(x, w)), xf, wf128))
    # s2d output formulation: out [128,128, 4*3=12]; input s2d [131,131,256]
    xfs = i8(B, 131, 131, 256)
    wfs = i8(4, 4, 256, 12)
    cases.append(("final s2d 4x4 c256->12", jax.jit(
        lambda x, w: conv(x, w)), xfs, wfs))
    wfs128 = i8(4, 4, 256, 128)
    cases.append(("final s2d 4x4 c256->128", jax.jit(
        lambda x, w: conv(x, w)), xfs, wfs128))

    for name, fn, *args in cases:
        try:
            ms = timeit(fn, *args)
            print(f"{name:28s}: {ms:8.2f} ms ({1000 * ms / B:6.1f} us/img)")
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
