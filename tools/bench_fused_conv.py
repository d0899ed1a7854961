#!/usr/bin/env python
"""Microbench: fused Pallas int8 conv+epilogue vs the XLA site chain.

Times 16 chained resblock-conv1 sites (the trunk's conv count) at batch B,
plus a stage profile of the current int8 generator (encoder / trunk /
decoder split) to locate the remaining time.
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

from msig_tpu.ops import fused_conv_int8 as fc
from msig_tpu.ops.norm import adain_modulate

_DN = ("NHWC", "HWIO", "NHWC")
B = int(os.environ.get("B", "128"))
N_SITES = 16


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


def main():
    rng = np.random.default_rng(0)
    c = 256
    x = jnp.asarray(rng.integers(-127, 128, (B, 64, 64, c), dtype=np.int8))
    ws = [jnp.asarray(rng.integers(-32, 33, (3, 3, c, c), dtype=np.int8))
          for _ in range(N_SITES)]
    gammas = jnp.asarray(rng.normal(1.0, 0.5, (N_SITES, B, c)).astype(np.float32))
    betas = jnp.asarray(rng.normal(0.0, 0.5, (N_SITES, B, c)).astype(np.float32))

    @jax.jit
    def xla_chain(x, ws, gammas, betas):
        h = x
        for i in range(N_SITES):
            y = jax.lax.conv_general_dilated(
                h, ws[i], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=_DN, preferred_element_type=jnp.int32)
            z = jnp.maximum(adain_modulate(y.astype(jnp.bfloat16), gammas[i], betas[i]), 0)
            amax = jnp.max(jnp.abs(z), axis=(1, 2, 3), keepdims=True).astype(jnp.float32)
            s = jnp.where(amax > 0, 127.0 / amax, 1.0).astype(z.dtype)
            h = jnp.clip(jnp.round((z * s).astype(jnp.float32)), -127, 127).astype(jnp.int8)
        return h

    wps = [fc.pack_weights(w) for w in ws]

    @jax.jit
    def pallas_chain(xq, wps, gammas, betas):
        h = xq
        for i in range(N_SITES):
            h = fc.conv3x3_adain_relu_requant(h, wps[i], gammas[i], betas[i])
        return h

    xq = fc.pad_to_rows(x.reshape(B, fc.SROWS, c))

    ms_x = timeit(xla_chain, x, ws, gammas, betas)
    print(f"XLA 16-site chain   B={B}: {ms_x:8.2f} ms  ({B * 1000 / ms_x:.0f} eq-img/s)")
    ms_p = timeit(pallas_chain, xq, wps, gammas, betas)
    print(f"Pallas 16-site chain B={B}: {ms_p:8.2f} ms  ({B * 1000 / ms_p:.0f} eq-img/s)")
    print(f"speedup: {ms_x / ms_p:.2f}x")

    # correctness spot check on-device (first site only)
    y = jax.lax.conv_general_dilated(
        x, ws[0], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=_DN, preferred_element_type=jnp.int32)
    z = jnp.maximum(adain_modulate(y.astype(jnp.float32), gammas[0], betas[0]), 0.0)
    amax = jnp.max(jnp.abs(z), axis=(1, 2, 3), keepdims=True)
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    ref = jnp.clip(jnp.round(z * s), -127, 127).astype(jnp.int8)
    got = fc.conv3x3_adain_relu_requant(xq, wps[0], gammas[0], betas[0])
    got = got[:, fc.GUARD:fc.GUARD + fc.SROWS].reshape(B, 64, 64, c)
    diff = jnp.abs(got.astype(jnp.int32) - ref.astype(jnp.int32))
    print(f"max |diff| vs XLA: {int(jnp.max(diff))}, frac>0: {float(jnp.mean((diff > 0).astype(jnp.float32))):.5f}")


if __name__ == "__main__":
    main()
