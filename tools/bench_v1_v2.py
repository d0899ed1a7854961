#!/usr/bin/env python
"""v1 (im2col-concat) vs v2 (padded-col per-tap) fused kernel timing, TPU."""

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

from msig_tpu.ops import fused_conv_int8 as v1
from msig_tpu.ops import fused_conv_int8_v2 as v2

B = int(os.environ.get("B", "128"))


def timeit(fn, *args, iters=10, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return 1000 * (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    c = 256
    x = rng.integers(-127, 128, (B, 64, 64, c), dtype=np.int8)
    w = rng.integers(-32, 33, (3, 3, c, c), dtype=np.int8)
    gamma = jnp.asarray(rng.normal(1.0, 0.5, (B, c)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0.0, 0.5, (B, c)).astype(np.float32))
    wp = v1.pack_weights(jnp.asarray(w))

    x1 = v1.pad_to_rows(jnp.asarray(x).reshape(B, 64 * 64, c))
    x2 = v2.to_padded_rows(jnp.asarray(x))

    f1 = jax.jit(lambda x, w, g, b: v1.conv3x3_adain_relu_requant(x, w, g, b))
    f2 = jax.jit(lambda x, w, g, b: v2.conv3x3_adain_relu_requant(x, w, g, b, w_img=64))
    print(f"relu site   v1: {timeit(f1, x1, wp, gamma, beta):7.2f} ms")
    print(f"relu site   v2: {timeit(f2, x2, wp, gamma, beta):7.2f} ms")

    hs = jnp.asarray(rng.random((B, 1)).astype(np.float32) + 0.5)
    r1 = jax.jit(lambda y, h, s, w, g, b: v1.conv3x3_adain_residual_requant(y, h, s, w, g, b))
    r2 = jax.jit(lambda y, h, s, w, g, b: v2.conv3x3_adain_residual_requant(y, h, s, w, g, b, w_img=64))
    print(f"res site    v1: {timeit(r1, x1, x1, hs, wp, gamma, beta):7.2f} ms")
    print(f"res site    v2: {timeit(r2, x2, x2, hs, wp, gamma, beta):7.2f} ms")

    # up sites
    wu0 = rng.integers(-16, 17, (4, 4, 256, 128), dtype=np.int8)
    wu0p = v1.pack_convt_weights(jnp.asarray(wu0), 256, 128)
    u1 = jax.jit(lambda x, w: v1.convt4x4s2_in_relu_requant(x, w, 64, v1.GUARD))
    u2 = jax.jit(lambda x, w: v2.convt4x4s2_in_relu_requant(x, w, 64))
    print(f"up0 site    v1: {timeit(u1, x1, wu0p):7.2f} ms")
    print(f"up0 site    v2: {timeit(u2, x2, wu0p):7.2f} ms")

    xb = rng.integers(-127, 128, (B, 128, 128, 128), dtype=np.int8)
    wu1 = rng.integers(-16, 17, (4, 4, 128, 64), dtype=np.int8)
    wu1p = v1.pack_convt_weights(jnp.asarray(wu1), 128, 64)
    xb1 = v1.pad_rows(jnp.asarray(xb).reshape(B, 128 * 128, 128), 256)
    xb2 = v2.to_padded_rows(jnp.asarray(xb))
    w1 = jax.jit(lambda x, w: v1.convt4x4s2_in_relu_requant(x, w, 128, 256))
    w2 = jax.jit(lambda x, w: v2.convt4x4s2_in_relu_requant(x, w, 128))
    print(f"up1 site    v1: {timeit(w1, xb1, wu1p):7.2f} ms")
    print(f"up1 site    v2: {timeit(w2, xb2, wu1p):7.2f} ms")


if __name__ == "__main__":
    main()
