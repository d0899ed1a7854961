#!/usr/bin/env python
"""Full quantized generator: XLA trunk vs fused Pallas trunk (speed + PSNR)."""

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

from msig_tpu.infer.quantized import quantize_generator_params, quantized_generator_apply
from msig_tpu.models import StyleCycleGANGenerator
from msig_tpu.train.step import prepare_images

B = int(os.environ.get("B", "128"))


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


def psnr(a, b):
    mse = float(jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32))))
    return float("inf") if mse == 0 else 10 * np.log10(4.0 / mse)  # range [-1,1]


def main():
    gen = StyleCycleGANGenerator(style_dim=256, n_residual_blocks=8, dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, 256, 256, 3), jnp.bfloat16)
    params = gen.init(jax.random.PRNGKey(0), img0, jnp.zeros((1, 256), jnp.bfloat16))
    q = quantize_generator_params(params, 8)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8))
    style = jnp.asarray(rng.normal(0, 1, (B, 256)).astype(np.float32))

    xla = jax.jit(lambda q, i, s: quantized_generator_apply(
        q, i, s, out_dtype=jnp.bfloat16, fused_trunk=False))
    pal = jax.jit(lambda q, i, s: quantized_generator_apply(
        q, i, s, out_dtype=jnp.bfloat16, fused_trunk=True))
    bf = jax.jit(lambda p, i, s: gen.apply(
        p, prepare_images(i, jnp.bfloat16), s.astype(jnp.bfloat16)))

    ms_x = timeit(xla, q, img, style)
    print(f"int8 XLA trunk   : {ms_x:7.2f} ms  ({B * 1000 / ms_x:.0f} img/s)")
    ms_p = timeit(pal, q, img, style)
    print(f"int8 Pallas trunk: {ms_p:7.2f} ms  ({B * 1000 / ms_p:.0f} img/s)")

    ref = bf(params, img, style)
    ox = xla(q, img, style)
    op = pal(q, img, style)
    print(f"PSNR xla-int8 vs bf16  : {psnr(ox, ref):.1f} dB")
    print(f"PSNR pallas-int8 vs bf16: {psnr(op, ref):.1f} dB")
    print(f"PSNR pallas vs xla-int8 : {psnr(op, ox):.1f} dB")


if __name__ == "__main__":
    main()
