#!/usr/bin/env python
"""Ablation of the fused conv kernel: where do the 21us/program go?"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from msig_tpu.ops import fused_conv_int8 as fc

B = int(os.environ.get("B", "128"))
N_SITES = 16
C = 256
CHUNK = fc.CHUNK
N_CHUNKS = fc.SROWS // CHUNK


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


def make_variant(mode):
    """mode: dots_only (fixed lhs), conv (copies+dots), conv_nomask, full."""

    def kernel(x_ref, w_ref, o_ref, lhs, acc):
        for c in range(N_CHUNKS):
            if mode != "dots_only":
                j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) % 64
                le, re_ = j == 0, j == 63
                for t, off in enumerate(fc._OFFS):
                    w = x_ref[0, pl.ds(fc.GUARD + c * CHUNK + off, CHUNK), :]
                    if mode != "conv_nomask":
                        if t % 3 == 0:
                            w = jnp.where(le, jnp.int8(0), w)
                        elif t % 3 == 2:
                            w = jnp.where(re_, jnp.int8(0), w)
                    lhs[:, t * C:(t + 1) * C] = w
            yc = jax.lax.dot_general(
                lhs[:, :], w_ref[:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc[pl.ds(c * CHUNK, CHUNK), :] = yc
        # cheap write so nothing is DCE'd
        for c in range(N_CHUNKS):
            o_ref[0, pl.ds(fc.GUARD + c * CHUNK, CHUNK), :] = (
                acc[pl.ds(c * CHUNK, CHUNK), :].astype(jnp.int8))
        o_ref[0, pl.ds(0, fc.GUARD), :] = jnp.zeros((fc.GUARD, C), jnp.int8)
        o_ref[0, pl.ds(fc.GUARD + fc.SROWS, fc.GUARD), :] = jnp.zeros((fc.GUARD, C), jnp.int8)

    def call(x_q, w_packed):
        return pl.pallas_call(
            kernel,
            grid=(x_q.shape[0],),
            in_specs=[
                pl.BlockSpec((1, fc.XROWS, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((9 * C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, fc.XROWS, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((x_q.shape[0], fc.XROWS, C), jnp.int8),
            scratch_shapes=[
                pltpu.VMEM((CHUNK, 9 * C), jnp.int8),
                pltpu.VMEM((fc.SROWS, C), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        )(x_q, w_packed)

    return call


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (B, 64, 64, C), dtype=np.int8))
    ws = [jnp.asarray(rng.integers(-32, 33, (3, 3, C, C), dtype=np.int8))
          for _ in range(N_SITES)]
    wps = [fc.pack_weights(w) for w in ws]
    gammas = jnp.asarray(rng.normal(1.0, 0.5, (N_SITES, B, C)).astype(np.float32))
    betas = jnp.asarray(rng.normal(0.0, 0.5, (N_SITES, B, C)).astype(np.float32))
    xq = fc.pad_to_rows(x.reshape(B, fc.SROWS, C))

    for mode in ("dots_only", "conv_nomask", "conv"):
        call = make_variant(mode)

        @jax.jit
        def chain(xq, wps):
            h = xq
            for i in range(N_SITES):
                h = call(h, wps[i])
            return h

        ms = timeit(chain, xq, wps)
        print(f"{mode:12s}: {ms:7.2f} ms ({1000 * ms / N_SITES / B:.1f} us/site/img)")

    @jax.jit
    def full(xq, wps, gammas, betas):
        h = xq
        for i in range(N_SITES):
            h = fc.conv3x3_adain_relu_requant(h, wps[i], gammas[i], betas[i])
        return h

    ms = timeit(full, xq, wps, gammas, betas)
    print(f"{'full':12s}: {ms:7.2f} ms ({1000 * ms / N_SITES / B:.1f} us/site/img)")


if __name__ == "__main__":
    main()
