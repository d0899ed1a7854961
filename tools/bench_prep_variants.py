#!/usr/bin/env python
"""TPU timing of prep_s2d4_input reformulations (bit-identical on CPU).

The round-4 512^2 ablation showed prep at 327.9 us/img — 16x the 256^2
per-image cost for 4x the data (results/logs/r5_full/ablate_512.log).
The suspect is the 6-D byte transpose. Variants:

  v1  shipping: reshape(b,gc,4,gc,4,3)  transpose(0,1,3,2,4,5)
  v2  merged trailing dims: (b,gc,4,gc,12) transpose(0,1,3,2)
  v3  no transpose: 4 strided row-phase slices + lane concat

Usage: [B=..] [SIZE=..] python tools/bench_prep_variants.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from msig_tpu.ops.fused_enc_int8 import enc_geometry, prep_s2d4_input


def _sync(x):
    np.asarray(jax.device_get(x.ravel()[0]))


def prep_v2(img_u8):
    b, px = img_u8.shape[0], img_u8.shape[1]
    w_cells = px // 4
    wp, _, _, _, _, in0_slab = enc_geometry(w_cells)
    gc = w_cells + 2
    x = jax.lax.bitcast_convert_type(img_u8 ^ jnp.uint8(128), jnp.int8)
    x = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
    x = x.reshape(b, gc, 4, gc, 12).transpose(0, 1, 3, 2, 4)
    x = x.reshape(b, gc, gc, 48)
    x = jnp.pad(x, ((0, 0), (0, 1), (0, wp - gc), (0, 0)))
    return x.reshape(b, in0_slab, 48)


def prep_v3(img_u8):
    b, px = img_u8.shape[0], img_u8.shape[1]
    w_cells = px // 4
    wp, _, _, _, _, in0_slab = enc_geometry(w_cells)
    gc = w_cells + 2
    x = jax.lax.bitcast_convert_type(img_u8 ^ jnp.uint8(128), jnp.int8)
    x = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
    phases = [x[:, r::4].reshape(b, gc, gc, 12) for r in range(4)]
    x = jnp.concatenate(phases, axis=-1)
    x = jnp.pad(x, ((0, 0), (0, 1), (0, wp - gc), (0, 0)))
    return x.reshape(b, in0_slab, 48)


def main():
    import msig_tpu

    msig_tpu.enable_persistent_compile_cache()
    size = int(os.environ.get("SIZE", "512"))
    bsz = int(os.environ.get("B", "32" if size == 512 else "256"))
    rng = np.random.default_rng(0)
    img = jax.device_put(
        rng.integers(0, 256, (bsz, size, size, 3), dtype=np.uint8))
    for name, fn in (("v1 (shipping)", prep_s2d4_input), ("v2", prep_v2),
                     ("v3", prep_v3)):
        f = jax.jit(fn)
        out = None
        for _ in range(3):
            out = f(img)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(img)
        _sync(out)
        ms = (time.perf_counter() - t0) / 20 * 1000
        print(f"SIZE={size} B={bsz} {name:14s}: {ms:7.2f} ms/batch "
              f"({ms / bsz * 1000:6.1f} us/img)", flush=True)


if __name__ == "__main__":
    main()
