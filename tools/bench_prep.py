#!/usr/bin/env python
"""Standalone timing of prep_s2d4_input formulations at B=256.

The s2d-4 transpose of the uint8 input batch is pure layout work; XLA's
cost depends on the minor contiguous block size. Variants:
  a) 48-lane byte path (round-2 shipping): minor block = 3 bytes
  b) int32-bitcast path: pad RGBX, 2 bitcasts around an int32 transpose
  c) RGBX no-bitcast: pad to 4ch, transpose with a 16-byte minor block
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msig_tpu.ops.fused_enc_int8 import IN0_ROWS, IN0_SLAB, WP

B = int(os.environ.get("B", "256"))


def prep_a48(img_u8):
    b = img_u8.shape[0]
    x = (img_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    x = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
    x = x.reshape(b, 66, 4, 66, 4, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, 66, 66, 48)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, WP - 66), (0, 0)))
    x = x.reshape(b, IN0_ROWS, 48)
    return jnp.pad(x, ((0, 0), (0, IN0_SLAB - IN0_ROWS), (0, 0)))


def prep_b_bitcast(img_u8):
    b = img_u8.shape[0]
    x = (img_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    xi = xi.reshape(b, 66, 4, 66, 4).transpose(0, 1, 3, 2, 4)
    x = jax.lax.bitcast_convert_type(
        xi.reshape(b, 66, 66, 16), jnp.int8).reshape(b, 66, 66, 64)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, WP - 66), (0, 0)))
    x = x.reshape(b, IN0_ROWS, 64)
    return jnp.pad(x, ((0, 0), (0, IN0_SLAB - IN0_ROWS), (0, 0)))


def prep_c_rgbx(img_u8):
    b = img_u8.shape[0]
    x = (img_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
    x = x.reshape(b, 66, 4, 66, 16).transpose(0, 1, 3, 2, 4)
    x = x.reshape(b, 66, 66, 64)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, WP - 66), (0, 0)))
    x = x.reshape(b, IN0_ROWS, 64)
    return jnp.pad(x, ((0, 0), (0, IN0_SLAB - IN0_ROWS), (0, 0)))


def _sync(x):
    np.asarray(jax.device_get(x.ravel()[0]))


def timeit(fn, x, iters=20, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(x)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8))
    a = np.asarray(jax.jit(prep_a48)(img))
    c = np.asarray(jax.jit(prep_c_rgbx)(img))
    bv = np.asarray(jax.jit(prep_b_bitcast)(img))
    # layout equivalence: c/b lanes [py][px][c4]; a lanes [py][px][c3]
    a4 = a.reshape(-1, 16, 3)
    np.testing.assert_array_equal(c.reshape(-1, 16, 4)[:, :, :3], a4)
    np.testing.assert_array_equal(bv.reshape(-1, 16, 4)[:, :, :3], a4)
    assert (c.reshape(-1, 16, 4)[:, :, 3] == 0).all()
    print(f"B={B}")
    for name, fn in (("a48-byte", prep_a48), ("b-int32-bitcast", prep_b_bitcast),
                     ("c-rgbx-16B", prep_c_rgbx)):
        print(f"  {name:<16}: {timeit(fn, img):6.2f} ms")


if __name__ == "__main__":
    main()
