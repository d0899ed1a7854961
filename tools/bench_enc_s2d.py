#!/usr/bin/env python
"""XLA conv variants for the int8 encoder: original vs space-to-depth forms.

conv0: 7x7 s1 3->64 @256^2  vs  3x3 s1 48->1024 @66^2 (s2d-4)
conv1: 4x4 s2 64->128 @256^2 vs 3x3 s1 256->128 @128^2 (s2d-2 input)
conv2: 4x4 s2 128->256 @128^2 vs 3x3 s1 512->256 @64^2 (s2d-2 input)
Each timed with its IN/relu/requant epilogue fused in the same jit.
"""

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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msig_tpu.infer.quantized import _conv_i8, _requant
from msig_tpu.ops.norm import instance_norm

B = int(os.environ.get("B", "128"))
_DN = ("NHWC", "HWIO", "NHWC")


def _sync(out):
    """block_until_ready lies through the axon tunnel; fetch a scalar."""
    return sum(float(jnp.sum(l[..., :1].astype(jnp.float32)))
               for l in jax.tree.leaves(out))


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fn(*args)
    _sync(fn(*args))
    return 1000 * (time.perf_counter() - t0) / iters


def in_relu_rq_folded(y, fold):
    """IN+relu+requant where stats fold `fold` phase blocks per channel."""
    b, h, w, c4 = y.shape
    c = c4 // fold
    yf = y.astype(jnp.float32).reshape(b, h, w, fold, c)
    mean = jnp.mean(yf, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean((yf - mean) ** 2, axis=(1, 2, 3), keepdims=True)
    z = jnp.maximum((yf - mean) * jax.lax.rsqrt(var + 1e-5), 0)
    z = z.reshape(b, h, w, c4).astype(jnp.bfloat16)
    return _requant(z)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(-128, 128, (B, 256, 256, 3)), jnp.int8)

    # ---- conv0 variants
    w0 = jnp.asarray(rng.integers(-32, 33, (7, 7, 3, 64)), jnp.int8)

    @jax.jit
    def conv0_orig(x, w):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        y = _conv_i8(xp, w, 1, ((0, 0), (0, 0)))
        return _requant(jnp.maximum(instance_norm(y.astype(jnp.bfloat16)), 0))

    # s2d-4 form: kernel [7,7,3,64] -> [3,3,48,1024]
    w0_np = np.zeros((3, 3, 48, 1024), np.int8)
    wsrc = np.asarray(w0)
    for u in range(7):
        for v in range(7):
            for qy in range(4):
                for qx in range(4):
                    # out pixel (4I+qy), tap u: input pixel 4I+qy+u-3 = 4(I+dy)+py
                    t = qy + u - 3
                    dy, py = t // 4, t % 4
                    t = qx + v - 3
                    dxx, px = t // 4, t % 4
                    if not (-1 <= dy <= 1 and -1 <= dxx <= 1):
                        raise AssertionError((u, qy, dy))
                    for ci in range(3):
                        w0_np[dy + 1, dxx + 1, (py * 4 + px) * 3 + ci,
                              (qy * 4 + qx) * 64:(qy * 4 + qx + 1) * 64] = wsrc[u, v, ci]
    w0s = jnp.asarray(w0_np)

    @jax.jit
    def conv0_s2d(x, w):
        xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
        xs = xp.reshape(B, 66, 4, 66, 4, 3).transpose(0, 1, 3, 2, 4, 5).reshape(B, 66, 66, 48)
        y = _conv_i8(xs, w, 1, ((0, 0), (0, 0)))  # [B,64,64,1024]
        return in_relu_rq_folded(y, 16)

    print(f"conv0 s2d-4: {timeit(conv0_s2d, img, w0s):7.2f} ms  (orig ~14.3+epi, known)", flush=True)
    n = 2
    a = np.asarray(jax.jit(conv0_orig.__wrapped__)(img[:n], w0))
    bq = np.asarray(conv0_s2d(img, w0s)[:n])
    bq_un = bq.reshape(n, 64, 64, 4, 4, 64).transpose(0, 1, 3, 2, 4, 5).reshape(n, 256, 256, 64)
    diff = np.abs(a.astype(np.int32) - bq_un.astype(np.int32))
    print(f"conv0 parity: maxdiff={diff.max()} frac={(diff > 1).mean():.4f}", flush=True)

    # ---- conv1 variants
    h0 = jnp.asarray(rng.integers(-128, 128, (B, 256, 256, 64)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-32, 33, (4, 4, 64, 128)), jnp.int8)

    @jax.jit
    def conv1_orig(x, w):
        y = _conv_i8(x, w, 2, ((1, 1), (1, 1)))
        return _requant(jnp.maximum(instance_norm(y.astype(jnp.bfloat16)), 0))

    # s2d-2 form: [4,4,64,128] -> [3,3,256,128]; input s2d [B,128,128,256]
    w1_np = np.zeros((3, 3, 256, 128), np.int8)
    ws = np.asarray(w1)
    for u in range(4):
        for v in range(4):
            t = u - 1
            dy, py = t // 2, t % 2
            t = v - 1
            dxx, px = t // 2, t % 2
            w1_np[dy + 1, dxx + 1, (py * 2 + px) * 64:(py * 2 + px + 1) * 64, :] = ws[u, v]
    w1s = jnp.asarray(w1_np)

    @jax.jit
    def conv1_s2d(x, w):
        xs = x.reshape(B, 128, 2, 128, 2, 64).transpose(0, 1, 3, 2, 4, 5).reshape(B, 128, 128, 256)
        y = _conv_i8(xs, w, 1, ((1, 1), (1, 1)))
        return _requant(jnp.maximum(instance_norm(y.astype(jnp.bfloat16)), 0))

    print(f"conv1 s2d-2: {timeit(conv1_s2d, h0, w1s):7.2f} ms  (orig 12.7, known)", flush=True)
    diff = np.abs(np.asarray(jax.jit(conv1_orig.__wrapped__)(h0[:2], w1)).astype(np.int32)
                  - np.asarray(conv1_s2d(h0, w1s)[:2]).astype(np.int32))
    print(f"conv1 parity: maxdiff={diff.max()} frac={(diff > 1).mean():.4f}", flush=True)

    # ---- conv2 variants
    h1 = jnp.asarray(rng.integers(-128, 128, (B, 128, 128, 128)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-32, 33, (4, 4, 128, 256)), jnp.int8)

    @jax.jit
    def conv2_orig(x, w):
        y = _conv_i8(x, w, 2, ((1, 1), (1, 1)))
        return _requant(jnp.maximum(instance_norm(y.astype(jnp.bfloat16)), 0))

    w2_np = np.zeros((3, 3, 512, 256), np.int8)
    ws = np.asarray(w2)
    for u in range(4):
        for v in range(4):
            t = u - 1
            dy, py = t // 2, t % 2
            t = v - 1
            dxx, px = t // 2, t % 2
            w2_np[dy + 1, dxx + 1, (py * 2 + px) * 128:(py * 2 + px + 1) * 128, :] = ws[u, v]
    w2s = jnp.asarray(w2_np)

    @jax.jit
    def conv2_s2d(x, w):
        xs = x.reshape(B, 64, 2, 64, 2, 128).transpose(0, 1, 3, 2, 4, 5).reshape(B, 64, 64, 512)
        y = _conv_i8(xs, w, 1, ((1, 1), (1, 1)))
        return _requant(jnp.maximum(instance_norm(y.astype(jnp.bfloat16)), 0))

    print(f"conv2 s2d-2: {timeit(conv2_s2d, h1, w2s):7.2f} ms  (orig 6.1, known)", flush=True)
    diff = np.abs(np.asarray(jax.jit(conv2_orig.__wrapped__)(h1[:2], w2)).astype(np.int32)
                  - np.asarray(conv2_s2d(h1, w2s)[:2]).astype(np.int32))
    print(f"conv2 parity: maxdiff={diff.max()} frac={(diff > 1).mean():.4f}", flush=True)

    # ---- final conv variants (7x7 64->3 @256^2, reflect pad, dequant+tanh)
    hf = jnp.asarray(rng.integers(-128, 128, (B, 256, 256, 64)), jnp.int8)
    wf = jnp.asarray(rng.integers(-32, 33, (7, 7, 64, 3)), jnp.int8)
    wf8 = jnp.pad(wf, ((0, 0), (0, 0), (0, 0), (0, 5)))  # N padded 3->8

    @jax.jit
    def final_orig(x, w):
        xi = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        y = _conv_i8(xi, w, 1, ((0, 0), (0, 0)))[..., :3]
        return jnp.tanh(y.astype(jnp.float32) * 1e-5).astype(jnp.bfloat16)

    # s2d-4: [7,7,64,3] -> [3,3,1024,48]
    wf_np = np.zeros((3, 3, 1024, 48), np.int8)
    ws = np.asarray(wf)
    for u in range(7):
        for v in range(7):
            for qy in range(4):
                for qx in range(4):
                    t = qy + u - 3
                    dy, py = t // 4, t % 4
                    t = qx + v - 3
                    dxx, px = t // 4, t % 4
                    wf_np[dy + 1, dxx + 1,
                          (py * 4 + px) * 64:(py * 4 + px + 1) * 64,
                          (qy * 4 + qx) * 3:(qy * 4 + qx + 1) * 3] = ws[u, v]
    wfs = jnp.asarray(wf_np)

    @jax.jit
    def final_s2d(x, w):
        xi = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
        xs = xi.reshape(B, 66, 4, 66, 4, 64).transpose(0, 1, 3, 2, 4, 5).reshape(B, 66, 66, 1024)
        y = _conv_i8(xs, w, 1, ((0, 0), (0, 0)))  # [B,64,64,48]
        y = y.reshape(B, 64, 64, 4, 4, 3).transpose(0, 1, 3, 2, 4, 5).reshape(B, 256, 256, 3)
        return jnp.tanh(y.astype(jnp.float32) * 1e-5).astype(jnp.bfloat16)

    print(f"final s2d-4(N=48): {timeit(final_s2d, hf, wfs):7.2f} ms  (orig ~8.1, known)", flush=True)
    a = np.asarray(jax.jit(final_orig.__wrapped__)(hf[:2], wf8)).astype(np.float32)
    bq = np.asarray(final_s2d(hf, wfs)[:2]).astype(np.float32)
    print(f"final parity: maxdiff={np.abs(a - bq).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
