#!/usr/bin/env python
"""Op-by-op timing of the int8 encoder at B=128, 256x256 (gap hunt)."""

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

from msig_tpu.infer.quantized import _conv_i8, _requant, quantize_generator_params
from msig_tpu.models import StyleCycleGANGenerator
from msig_tpu.ops.norm import instance_norm

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
    gen = StyleCycleGANGenerator(style_dim=256, n_residual_blocks=8, dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, 256, 256, 3), jnp.bfloat16)
    params = gen.init(jax.random.PRNGKey(0), img0, jnp.zeros((1, 256), jnp.bfloat16))
    q = quantize_generator_params(params, 8)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8))

    pad = jax.jit(lambda u: jnp.pad((u.astype(jnp.int32) - 128).astype(jnp.int8),
                                    ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect"))
    x0 = pad(img)
    conv0 = jax.jit(lambda x, w: _conv_i8(x, w, 1, ((0, 0), (0, 0))))
    y0 = conv0(x0, q["enc_conv0"])
    inrelu = jax.jit(lambda y: jnp.maximum(instance_norm(y.astype(jnp.bfloat16)), 0))
    h0 = inrelu(y0)
    rq = jax.jit(_requant)
    h0q = rq(h0)
    conv1 = jax.jit(lambda x, w: _conv_i8(x, w, 2, ((1, 1), (1, 1))))
    y1 = conv1(h0q, q["enc_conv1"])
    h1 = inrelu(y1)
    h1q = rq(h1)
    y2 = conv1(h1q, q["enc_conv2"])
    h2 = inrelu(y2)

    # fused epilogue alternatives XLA might pick: conv+IN+relu+requant in one jit
    fused1 = jax.jit(lambda x, w: _requant(jnp.maximum(instance_norm(
        _conv_i8(x, w, 2, ((1, 1), (1, 1))).astype(jnp.bfloat16)), 0)))
    _ = fused1(h0q, q["enc_conv1"])

    rows = [
        ("pad+recenter u8->i8", lambda: timeit(pad, img)),
        ("conv0 7x7 3->64 @256^2", lambda: timeit(conv0, x0, q["enc_conv0"])),
        ("IN+relu @256^2x64", lambda: timeit(inrelu, y0)),
        ("requant @256^2x64", lambda: timeit(rq, h0)),
        ("conv1 4x4s2 64->128", lambda: timeit(conv1, h0q, q["enc_conv1"])),
        ("IN+relu @128^2x128", lambda: timeit(inrelu, y1)),
        ("requant @128^2x128", lambda: timeit(rq, h1)),
        ("conv2 4x4s2 128->256", lambda: timeit(conv1, h1q, q["enc_conv2"])),
        ("IN+relu @64^2x256", lambda: timeit(inrelu, y2)),
        ("jit(conv1+IN+relu+rq)", lambda: timeit(fused1, h0q, q["enc_conv1"])),
    ]
    for name, f in rows:
        print(f"{name:26s}: {f():7.2f} ms")


if __name__ == "__main__":
    main()
