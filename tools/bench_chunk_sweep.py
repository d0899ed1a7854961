#!/usr/bin/env python
"""chunk_rows sweep for the v2 trunk kernels (readback-timed, solo TPU)."""

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

    from msig_tpu.ops import fused_conv_int8 as v1
    from msig_tpu.ops import fused_conv_int8_v2 as v2

    B = int(os.environ.get("B", "128"))
    rng = np.random.default_rng(0)
    c = 256
    x = rng.integers(-127, 128, (B, 64, 64, c), dtype=np.int8)
    w = rng.integers(-32, 33, (3, 3, c, c), dtype=np.int8)
    wp = v1.pack_weights(jnp.asarray(w))
    gamma = jnp.asarray(rng.normal(1.0, 0.5, (B, c)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0.0, 0.5, (B, c)).astype(np.float32))
    hs = jnp.asarray((rng.random((B, 1)) + 0.5).astype(np.float32))
    x2 = v2.to_padded_rows(jnp.asarray(x))

    def sync(out):
        return sum(float(jnp.sum(l[..., :1].astype(jnp.float32)))
                   for l in jax.tree.leaves(out))

    def timeit(f, *a, iters=15):
        for _ in range(3):
            sync(f(*a))
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            f(*a)
        sync(f(*a))
        return 1000 * (time.perf_counter() - t0) / iters

    for cr in (8, 16, 32, 64):
        @jax.jit
        def chain16(h, w, g, b, s, cr=cr):
            for i in range(8):
                y = v2.conv3x3_adain_relu_requant(h, w, g, b, w_img=64,
                                                  chunk_rows=cr)
                h, s = v2.conv3x3_adain_residual_requant(
                    y, h, s, w, g, b, w_img=64, chunk_rows=cr)
            return h, s

        ms = timeit(chain16, x2, wp, gamma, beta, hs)
        print(f"chunk_rows={cr:3d}: 16-site chain {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
