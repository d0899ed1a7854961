#!/usr/bin/env python
"""PSNR of the fused int8 generator path vs the bf16 path, on real TPU.

The CPU test suite validates the int8 XLA path (tests/test_quantized.py);
the all-Pallas path (fused encoder + trunk + decoder) only runs on TPU, so
its end-to-end accuracy is checked here. Gate: >= 35 dB (VERDICT round-1
criterion)."""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import msig_tpu

    msig_tpu.enable_persistent_compile_cache()
    import jax
    import jax.numpy as jnp

    from msig_tpu.infer.quantized import (
        quantize_generator_params, quantized_generator_apply,
        quantized_generator_apply_staged,
    )
    from msig_tpu.models import StyleCycleGANGenerator
    from msig_tpu.train.step import prepare_images

    B = int(os.environ.get("B", "8"))
    # SIZE=512 gates the 512^2 all-Pallas uint8 path (HBM-staged enc0/up1;
    # pair with MSIG_STAGE_FP16=1 to PSNR-gate the fp16-staged accumulators).
    size = int(os.environ.get("SIZE", "256"))
    gen = StyleCycleGANGenerator(style_dim=256, n_residual_blocks=8,
                                 dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, size, size, 3), jnp.bfloat16)
    params = gen.init(jax.random.PRNGKey(0), img0,
                      jnp.zeros((1, 256), jnp.bfloat16))
    q = quantize_generator_params(params, 8)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (B, size, size, 3), dtype=np.uint8))
    style = jnp.asarray(rng.normal(0, 1, (B, 256)).astype(np.float32))

    @jax.jit
    def bf16_fwd(p, u8, s):
        return gen.apply(p, prepare_images(u8, jnp.bfloat16),
                         s.astype(jnp.bfloat16)).astype(jnp.float32)

    # 512^2 engages the all-Pallas HBM-staged path only for uint8 serving
    # outputs; compare in the uint8 domain there (mapped back to [-1, 1]).
    out_dtype = jnp.uint8 if size == 512 else jnp.float32
    fused = jax.jit(lambda q, u8, s: quantized_generator_apply(
        q, u8, s, fused_trunk=True, out_dtype=out_dtype))
    xla_i8 = jax.jit(lambda q, u8, s: quantized_generator_apply(
        q, u8, s, fused_trunk=False, out_dtype=out_dtype))

    ref = np.asarray(bf16_fwd(params, img, style))

    def psnr_of(fn):
        out = np.asarray(fn(q, img, style))
        if out.dtype == np.uint8:
            out = out.astype(np.float32) / 127.5 - 1.0
        mse = float(np.mean((out - ref) ** 2))
        return 10 * np.log10(4.0 / mse)  # signal range [-1, 1] -> peak 2

    for name, fn in (("fused all-Pallas", fused), ("int8 XLA", xla_i8)):
        psnr = psnr_of(fn)
        print(f"{name}: PSNR vs bf16 = {psnr:.1f} dB "
              f"({'OK' if psnr >= 35 else 'FAIL <35'})", flush=True)

    if os.environ.get("ATTRIBUTE", "1") == "1" and size == 256:
        # Per-stage attribution (VERDICT r3 directive #3): swap exactly one
        # stage between Pallas and XLA; the PSNR delta names the lossy
        # kernel. 'only <s> Pallas' isolates a stage's own contribution;
        # 'all but <s>' shows the path without it.
        print("\nper-stage attribution (PSNR vs bf16, dB):", flush=True)
        stages = ("enc", "trunk", "dec")
        variants = [("all Pallas", stages), ("all XLA", ())]
        variants += [(f"only {s} Pallas", (s,)) for s in stages]
        variants += [(f"all but {s} Pallas",
                      tuple(t for t in stages if t != s)) for s in stages]
        for name, pl in variants:
            fn = jax.jit(lambda q, u8, s, pl=pl: quantized_generator_apply_staged(
                q, u8, s, pallas=pl))
            print(f"  {name:22s} {psnr_of(fn):6.1f}", flush=True)


if __name__ == "__main__":
    main()
