"""Parity of the 512^2 fused decoder tail (ops/fused_dec_int8.py, 128-grid).

VERDICT r2 weak #3: at 512^2 the decoder previously fell back to XLA
because up1's int32 accumulator slab exceeds VMEM. The HBM-staged kernel
pair (up1_s2d16_hbm) removes that limit; these tests pin its numerics to
the already-validated phase-split composition, all in Pallas interpret
mode on CPU.

Reference behavior: decoder tail of /root/reference/model.py:136-143 at
the 512x512 input size (BASELINE config 5).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msig_tpu.ops import fused_conv_int8_v2 as f2
from msig_tpu.ops import fused_dec_int8 as fd


@pytest.mark.heavy
def test_up1_hbm_matches_single_kernel_64():
    """The HBM-staged pair == the single-kernel site, same 64-grid input.

    Exercises the DMA staging + XLA stats fold against the in-kernel
    epilogue with identical inputs; only fp32 reduction order differs.
    """
    rng = np.random.default_rng(0)
    w_up0 = jnp.asarray(rng.integers(-127, 128, (4, 4, 256, 128),
                                     dtype=np.int8))
    w_up1 = rng.integers(-127, 128, (4, 4, 128, 64), dtype=np.int8)
    hq = f2.to_padded_rows(jnp.asarray(
        rng.integers(-127, 128, (2, 64, 64, 256), dtype=np.int8)))
    up0_ps, _ = f2.pack_convt_weights_ps(w_up0, 256, 128)
    y0g, _ = f2.convt4x4s2_in_relu_requant_ps(
        hq, up0_ps, f2.PS_TAPS, 64, guarded_out=True)
    wpk = fd.pack_up1_s2d16(w_up1)

    y1a, sa = fd.up1_s2d16(y0g, wpk)
    y1b, sb = fd.up1_s2d16_hbm(y0g, wpk, w_cells=64)
    np.testing.assert_allclose(np.asarray(sb).ravel(),
                               np.asarray(sa).ravel(), rtol=1e-5)
    diff = np.abs(np.asarray(y1a, np.int32) - np.asarray(y1b, np.int32))
    assert diff.max() <= 1, f"max int8 step diff {diff.max()}"
    assert (diff > 0).mean() < 1e-3


@pytest.mark.slow
def test_up1_s2d16_hbm_512_matches_composition():
    """512^2: guarded up0(128-grid) -> up1_s2d16_hbm == un-phase -> re-pad
    -> phase-split ConvT at w_img=256, at the int8 level."""
    rng = np.random.default_rng(1)
    w_up0 = jnp.asarray(rng.integers(-127, 128, (4, 4, 256, 128),
                                     dtype=np.int8))
    w_up1 = rng.integers(-127, 128, (4, 4, 128, 64), dtype=np.int8)
    hq = f2.to_padded_rows(jnp.asarray(
        rng.integers(-127, 128, (1, 128, 128, 256), dtype=np.int8)))
    up0_ps, _ = f2.pack_convt_weights_ps(w_up0, 256, 128)
    up1_ps, _ = f2.pack_convt_weights_ps(jnp.asarray(w_up1), 128, 64)

    # composition path on the 256-grid
    y0, _ = f2.convt4x4s2_in_relu_requant_ps(hq, up0_ps, f2.PS_TAPS, 128)
    y0r = f2.to_padded_rows(f2.unphase_s2d(y0, 128, 128))
    y1, s_want = f2.convt4x4s2_in_relu_requant_ps(y0r, up1_ps, f2.PS_TAPS, 256)
    want = np.asarray(f2.unphase_s2d(y1, 256, 64))

    # HBM-staged path directly on the s2d slab
    y0g, _ = f2.convt4x4s2_in_relu_requant_ps(
        hq, up0_ps, f2.PS_TAPS, 128, guarded_out=True)
    y1n, s_got = fd.up1_s2d16_hbm(y0g, fd.pack_up1_s2d16(np.asarray(w_up1)),
                                  w_cells=128)
    got = np.asarray(fd.unphase_s2d16(y1n, 64, w_cells=128))

    np.testing.assert_allclose(np.asarray(s_got).ravel(),
                               np.asarray(s_want).ravel(), rtol=1e-5)
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, f"max int8 step diff {diff.max()}"
    assert (diff > 0).mean() < 0.01

    # In-kernel reflect guard fill == the pure-JAX reference fill
    np.testing.assert_array_equal(
        np.asarray(fd.reflect_guard_ref(y1n, w_cells=128)), np.asarray(y1n))


def _slab_from_map_512(x):
    """[B,512,512,C] int8 -> zero-guarded s2d-16 slab on the 128-grid."""
    b, _, _, c = x.shape
    wp, srows, _, _, g = fd.dec_geometry(128)
    v = x.reshape(b, 128, 4, 128, 4, c).transpose(0, 1, 3, 2, 4, 5)
    v = v.reshape(b, 128, 128, 16 * c)
    v = jnp.pad(v, ((0, 0), (0, 0), (0, 8), (0, 0)))
    v = v.reshape(b, srows, 16 * c)
    return jnp.pad(v, ((0, 0), (g, g), (0, 0)))


@pytest.mark.slow
def test_reflect_guards_plus_final7_512_match_xla_reference():
    """128-grid reflect fill + final7 == reflect-pad XLA conv7 + dequant +
    tanh + uint8, exactly, INCLUDING the 3-pixel border."""
    rng = np.random.default_rng(2)
    x = rng.integers(-127, 128, (1, 512, 512, 64), dtype=np.int8)
    w = rng.integers(-127, 128, (7, 7, 64, 3), dtype=np.int8)
    ws = rng.uniform(0.001, 0.01, 3).astype(np.float32)
    bias = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
    inv_s = rng.uniform(0.005, 0.05, (1, 1, 1)).astype(np.float32)

    slab = fd.reflect_guard_ref(_slab_from_map_512(jnp.asarray(x)),
                                w_cells=128)
    u8 = fd.final7_tanh_u8(slab, fd.pack_final_s2d16(w), jnp.asarray(ws),
                           jnp.asarray(bias), jnp.asarray(inv_s),
                           w_cells=128)
    got = np.asarray(fd.unphase_s2d16_u8(u8, w_cells=128))

    hi = jnp.pad(jnp.asarray(x), ((0, 0), (3, 3), (3, 3), (0, 0)),
                 mode="reflect")
    y = jax.lax.conv_general_dilated(
        hi, jnp.asarray(w), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    yf = y.astype(jnp.float32) * (ws[None, None, None, :]
                                  * inv_s.reshape(1, 1, 1, 1)) + bias
    want = np.asarray(jnp.clip(jnp.round((jnp.tanh(yf) + 1.0) * 127.5),
                               0, 255).astype(jnp.uint8))
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, f"max uint8 diff {diff.max()}"
    assert (diff > 0).mean() < 1e-3


@pytest.mark.slow
def test_full_uint8_decoder_512_end_to_end():
    """Full quantized generator at 512^2, uint8 vs float path (PSNR gate)."""
    from msig_tpu.config import TrainConfig
    from msig_tpu.infer.quantized import (
        quantize_generator_params,
        quantized_generator_apply,
    )
    from msig_tpu.models.networks import StyleCycleGANGenerator

    cfg = TrainConfig()
    gen = StyleCycleGANGenerator(n_residual_blocks=2)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.integers(0, 256, (1, 512, 512, 3), dtype=np.uint8))
    style = jnp.asarray(rng.normal(size=(1, cfg.style_dim)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 256, 256, 3), jnp.float32),
                      jnp.zeros((1, cfg.style_dim), jnp.float32))
    q = quantize_generator_params(params, 2)

    f32 = quantized_generator_apply(q, img, style, n_res=2,
                                    out_dtype=jnp.float32, fused_trunk=True)
    want = np.asarray(jnp.clip(jnp.round((f32 + 1.0) * 127.5), 0, 255)
                      .astype(jnp.uint8))
    got = np.asarray(quantized_generator_apply(
        q, img, style, n_res=2, out_dtype=jnp.uint8, fused_trunk=True))
    assert got.dtype == np.uint8 and got.shape == (1, 512, 512, 3)
    mse = np.mean((got.astype(np.float64) - want.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr >= 35.0, f"uint8-vs-float-path PSNR {psnr:.1f} dB"
