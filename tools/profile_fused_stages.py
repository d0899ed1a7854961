#!/usr/bin/env python
"""Per-stage timing of the FUSED int8 generator path at B=128, 256x256.

Stages: encoder (XLA int8 convs) -> fused Pallas trunk (16 conv sites) ->
fused Pallas decoder (2 up sites + final conv). Also times individual
kernel invocations to locate the remaining gap to the ~2,300 img/s int8
ceiling (docs/PERF.md).
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

from msig_tpu.infer.quantized import (
    _conv_i8, _requant, _requant_with_inv_scale, _style_affine,
    _fused_trunk, _fused_decoder, quantize_generator_params,
)
from msig_tpu.models import StyleCycleGANGenerator
from msig_tpu.ops import fused_conv_int8 as fc
from msig_tpu.ops.norm import instance_norm

B = int(os.environ.get("B", "128"))


def _sync(x):
    jax.block_until_ready(x)


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

    trunk_j = jax.jit(lambda q, h, s: _fused_trunk(q, h, s, 8))
    hq_rows = trunk_j(q, h0, style)

    dec_j = jax.jit(lambda q, hr: _fused_decoder(q, hr, jnp.bfloat16))
    _ = dec_j(q, hq_rows)

    # individual kernel sites
    g1, b1 = _style_affine(style, q["res0_adain1_k"], q["res0_adain1_b"])
    conv1_j = jax.jit(lambda x, w, g, b: fc.conv3x3_adain_relu_requant(x, w, g, b))
    hq0, inv_s = _requant_with_inv_scale(h0)
    hq0 = fc.pad_to_rows(hq0.reshape(B, 64 * 64, 256))
    hs0 = inv_s.reshape(B, 1).astype(jnp.float32)
    y1 = conv1_j(hq0, q["res0_conv1_p"], g1, b1)
    conv2_j = jax.jit(lambda y, h, hs, w, g, b: fc.conv3x3_adain_residual_requant(y, h, hs, w, g, b))
    _ = conv2_j(y1, hq0, hs0, q["res0_conv2_p"], g1, b1)

    # v1 packed ConvT weights are tool-local (the engine ships the
    # phase-split up0_ps/up1_ps only)
    up0_p = fc.pack_convt_weights(q["dec_up0"], q["dec_up0"].shape[2], q["dec_up0"].shape[3])
    up1_p = fc.pack_convt_weights(q["dec_up1"], q["dec_up1"].shape[2], q["dec_up1"].shape[3])
    up0_j = jax.jit(lambda x, w: fc.convt4x4s2_in_relu_requant(x, w, 64, fc.GUARD))
    y0, _s = up0_j(hq_rows, up0_p)
    y0u = y0.reshape(B, 64, 64, 2, 2, 128).transpose(0, 1, 3, 2, 4, 5)
    y0u = fc.pad_rows(y0u.reshape(B, 128 * 128, 128), 256)
    up1_j = jax.jit(lambda x, w: fc.convt4x4s2_in_relu_requant(x, w, 128, 256))
    _ = up1_j(y0u, up1_p)

    @jax.jit
    def full(q, img_u8, style):
        h = encoder(q, img_u8)
        hr = _fused_trunk(q, h, style, 8)
        return _fused_decoder(q, hr, jnp.bfloat16)

    _ = full(q, img, style)

    stages = [
        ("encoder (3 convs)", lambda: timeit(encoder, q, img)),
        ("fused trunk (16 sites)", lambda: timeit(trunk_j, q, h0, style)),
        ("  conv1 site alone", lambda: timeit(conv1_j, hq0, q["res0_conv1_p"], g1, b1)),
        ("  conv2 site alone", lambda: timeit(conv2_j, y1, hq0, hs0, q["res0_conv2_p"], g1, b1)),
        ("fused decoder (2 ups+final)", lambda: timeit(dec_j, q, hq_rows)),
        ("  up0 kernel alone", lambda: timeit(up0_j, hq_rows, up0_p)),
        ("  up1 kernel alone", lambda: timeit(up1_j, y0u, up1_p)),
        ("full jit (one program)", lambda: timeit(full, q, img, style)),
    ]
    total = 0.0
    for name, f in stages:
        ms = f()
        if not name.startswith(("  ", "full")):
            total += ms
        print(f"{name:30s}: {ms:7.2f} ms  ({1000 * ms / B:5.1f} us/img)")
    print(f"{'sum of stages':30s}: {total:7.2f} ms -> {B / total * 1000:.0f} img/s")


if __name__ == "__main__":
    main()
