"""Int8 quantized generator vs the fp32 reference path (quality bound)."""

import numpy as np

import jax
import jax.numpy as jnp

from msig_tpu.infer.quantized import quantize_generator_params, quantized_generator_apply
from msig_tpu.models import StyleCycleGANGenerator


def _psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(4.0 / mse)  # [-1,1] range -> peak-to-peak 2


class TestQuantizedGenerator:
    def test_close_to_fp32_path(self):
        gen = StyleCycleGANGenerator(style_dim=16, n_residual_blocks=2)
        rng = np.random.default_rng(0)
        img_u8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
        img_f = jnp.asarray(img_u8.astype(np.float32) / 127.5 - 1.0)
        style = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
        params = gen.init(jax.random.PRNGKey(0), img_f, style)

        want = np.asarray(gen.apply(params, img_f, style))
        q = quantize_generator_params(params, 2)
        got = np.asarray(quantized_generator_apply(q, jnp.asarray(img_u8), style, n_res=2))

        assert got.shape == want.shape
        psnr = _psnr(got, want)
        assert psnr > 30.0, f"int8 path too lossy: PSNR {psnr:.1f} dB"

    def test_output_range(self):
        gen = StyleCycleGANGenerator(style_dim=8, n_residual_blocks=1)
        rng = np.random.default_rng(1)
        img_u8 = rng.integers(0, 256, (1, 16, 16, 3), dtype=np.uint8)
        style = jnp.asarray(rng.standard_normal((1, 8)).astype(np.float32))
        params = gen.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 16, 16, 3)), style)
        q = quantize_generator_params(params, 1)
        out = np.asarray(quantized_generator_apply(q, jnp.asarray(img_u8), style, n_res=1))
        assert np.all(np.abs(out) <= 1.0)
        assert np.isfinite(out).all()

    def test_fused_epilogue_matches_unfused(self):
        gen = StyleCycleGANGenerator(style_dim=16, n_residual_blocks=2)
        rng = np.random.default_rng(4)
        img_u8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
        style = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
        params = gen.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), style)
        q = quantize_generator_params(params, 2)
        # 32x32 input -> 8x8x256 resblock slab: supported by the kernels
        a = np.asarray(quantized_generator_apply(q, jnp.asarray(img_u8), style,
                                                 n_res=2, fused_epilogue=False))
        b = np.asarray(quantized_generator_apply(q, jnp.asarray(img_u8), style,
                                                 n_res=2, fused_epilogue=True))
        psnr = _psnr(a, b)
        assert psnr > 35.0, f"fused epilogue diverges: {psnr:.1f} dB"

    def test_fused_decoder_uint8_fallback_serving_conversion(self):
        """A uint8 request through _fused_decoder's float fallback (fused
        tail unavailable, e.g. non-standard dec_up1/final shapes) must apply
        the [0,255] serving conversion, not a raw astype(uint8) of the
        [-1,1] tanh output (which produced near-black images)."""
        from msig_tpu.infer.quantized import _fused_decoder
        from msig_tpu.ops import fused_conv_int8_v2 as fc

        gen = StyleCycleGANGenerator(style_dim=8, n_residual_blocks=1)
        params = gen.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)),
                          jnp.zeros((1, 8)))
        q = dict(quantize_generator_params(params, 1))
        q.pop("up1_s16", None)  # force the float-structure fallback
        rng = np.random.default_rng(5)
        # w_cells=16 satisfies the kernels' chunk geometry (srows % chunk == 0
        # at the default chunk_rows=16).
        slab = fc.to_padded_rows(jnp.asarray(
            rng.integers(-127, 128, (1, 16, 16, 256), dtype=np.int8)))

        f32 = np.asarray(_fused_decoder(q, slab, jnp.float32, w_cells=16))
        u8 = np.asarray(_fused_decoder(q, slab, jnp.uint8, w_cells=16))
        want = np.clip(np.round((f32 + 1.0) * 127.5), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(u8, want)
        assert u8.max() > 1  # not the raw-astype black image

    def test_jittable(self):
        gen = StyleCycleGANGenerator(style_dim=8, n_residual_blocks=1)
        rng = np.random.default_rng(2)
        img_u8 = jnp.asarray(rng.integers(0, 256, (1, 16, 16, 3), dtype=np.uint8))
        style = jnp.asarray(rng.standard_normal((1, 8)).astype(np.float32))
        params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), style)
        q = quantize_generator_params(params, 1)
        f = jax.jit(lambda q, i, s: quantized_generator_apply(q, i, s, n_res=1))
        out = f(q, img_u8, style)
        assert np.isfinite(np.asarray(out)).all()
