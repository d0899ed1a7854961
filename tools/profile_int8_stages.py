#!/usr/bin/env python
"""Per-stage timing of the int8 quantized generator at B=128, 256x256."""

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

from msig_tpu.infer.quantized import (
    _conv_i8, _requant, _requant_with_inv_scale, _style_affine,
    quantize_generator_params,
)
from msig_tpu.models import StyleCycleGANGenerator
from msig_tpu.ops.norm import adain_modulate, instance_norm

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


def main():
    gen = StyleCycleGANGenerator(style_dim=256, n_residual_blocks=8, dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, 256, 256, 3), jnp.bfloat16)
    params = gen.init(jax.random.PRNGKey(0), img0, jnp.zeros((1, 256), jnp.bfloat16))
    q = quantize_generator_params(params, 8)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8))
    style = jnp.asarray(rng.normal(0, 1, (B, 256)).astype(np.float32))

    @jax.jit
    def encoder(q, img_u8):
        x = (img_u8.astype(jnp.int32) - 128).astype(jnp.int8)
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = _conv_i8(x, q["enc_conv0"], 1, ((0, 0), (0, 0)))
        h = jnp.maximum(instance_norm(h.astype(jnp.bfloat16)), 0)
        h = _conv_i8(_requant(h), q["enc_conv1"], 2, ((1, 1), (1, 1)))
        h = jnp.maximum(instance_norm(h.astype(jnp.bfloat16)), 0)
        h = _conv_i8(_requant(h), q["enc_conv2"], 2, ((1, 1), (1, 1)))
        h = jnp.maximum(instance_norm(h.astype(jnp.bfloat16)), 0)
        return h

    h0 = encoder(q, img)

    @jax.jit
    def enc0_only(q, img_u8):
        x = (img_u8.astype(jnp.int32) - 128).astype(jnp.int8)
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        return _conv_i8(x, q["enc_conv0"], 1, ((0, 0), (0, 0)))

    @jax.jit
    def trunk(q, h, style):
        for i in range(8):
            g1, b1 = _style_affine(style, q[f"res{i}_adain1_k"], q[f"res{i}_adain1_b"])
            g2, b2 = _style_affine(style, q[f"res{i}_adain2_k"], q[f"res{i}_adain2_b"])
            y = _conv_i8(_requant(h), q[f"res{i}_conv1"], 1, ((1, 1), (1, 1)))
            y = jnp.maximum(adain_modulate(y.astype(jnp.bfloat16), g1, b1), 0)
            y = _conv_i8(_requant(y), q[f"res{i}_conv2"], 1, ((1, 1), (1, 1)))
            y = adain_modulate(y.astype(jnp.bfloat16), g2, b2)
            h = y + h
        return h

    h8 = trunk(q, h0, style)

    @jax.jit
    def decoder_ups(q, h):
        h = _conv_i8(_requant(h), q["dec_up0"], 1, ((2, 2), (2, 2)), lhs_dilation=(2, 2))
        h = jnp.maximum(instance_norm(h.astype(jnp.bfloat16)), 0)
        h = _conv_i8(_requant(h), q["dec_up1"], 1, ((2, 2), (2, 2)), lhs_dilation=(2, 2))
        h = jnp.maximum(instance_norm(h.astype(jnp.bfloat16)), 0)
        return h

    hd = decoder_ups(q, h8)

    @jax.jit
    def final(q, h):
        hi, inv_s = _requant_with_inv_scale(h)
        hi = jnp.pad(hi, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        y = _conv_i8(hi, q["out_kernel_i8"], 1, ((0, 0), (0, 0)))
        yf = y.astype(jnp.float32) * (q["out_wscale"][None, None, None, :] * inv_s)
        return jnp.tanh(yf + q["out_bias"]).astype(jnp.bfloat16)

    stages = [
        ("encoder (3 convs)", lambda: timeit(encoder, q, img)),
        ("  enc_conv0 alone", lambda: timeit(enc0_only, q, img)),
        ("trunk (8 blocks)", lambda: timeit(trunk, q, h0, style)),
        ("decoder ups (2 deconvs)", lambda: timeit(decoder_ups, q, h8)),
        ("final conv7+tanh", lambda: timeit(final, q, hd)),
    ]
    total = 0.0
    for name, f in stages:
        ms = f()
        if not name.startswith("  "):
            total += ms
        print(f"{name:26s}: {ms:7.2f} ms  ({1000 * ms / B:5.1f} us/img)")
    print(f"{'sum (ex. H2D/overlap)':26s}: {total:7.2f} ms")


if __name__ == "__main__":
    main()
