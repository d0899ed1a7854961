"""Parity of the fully-fused decoder tail (ops/fused_dec_int8.py).

Three layers of evidence, all in Pallas interpret mode on CPU:
  1. up1_s2d16 == the round-2 composition (un-phase -> re-pad -> phase-split
     ConvT site) at the int8 level.
  2. reflect_fill_s2d16 + final7_tanh_u8 == reflect-pad + XLA int8 conv7 +
     dequant + tanh + uint8 serving conversion.
  3. The full quantized generator with out_dtype=uint8 == the float path's
     output converted, end to end.

Reference behavior: decoder tail of /root/reference/model.py:136-143 and
the eager save path /root/reference/inference.py:290-299.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msig_tpu.ops import fused_conv_int8_v2 as f2
from msig_tpu.ops import fused_dec_int8 as fd

B = 2


def _rand_up_weights(rng):
    w_up0 = rng.integers(-127, 128, (4, 4, 256, 128), dtype=np.int8)
    w_up1 = rng.integers(-127, 128, (4, 4, 128, 64), dtype=np.int8)
    return jnp.asarray(w_up0), jnp.asarray(w_up1)


@pytest.mark.heavy
def test_up1_s2d16_matches_round2_composition():
    rng = np.random.default_rng(0)
    w_up0, w_up1 = _rand_up_weights(rng)
    hq = f2.to_padded_rows(jnp.asarray(
        rng.integers(-127, 128, (B, 64, 64, 256), dtype=np.int8)))
    up0_ps, _ = f2.pack_convt_weights_ps(w_up0, 256, 128)
    up1_ps, _ = f2.pack_convt_weights_ps(w_up1, 128, 64)

    # round-2 path: up0 -> un-phase -> re-pad -> up1 (128-grid) -> un-phase
    y0, _ = f2.convt4x4s2_in_relu_requant_ps(hq, up0_ps, f2.PS_TAPS, 64)
    y0r = f2.to_padded_rows(f2.unphase_s2d(y0, 64, 128))
    y1, s_want = f2.convt4x4s2_in_relu_requant_ps(y0r, up1_ps, f2.PS_TAPS, 128)
    want = np.asarray(f2.unphase_s2d(y1, 128, 64))

    # new path: guarded up0 -> up1 directly on the s2d slab
    y0g, _ = f2.convt4x4s2_in_relu_requant_ps(
        hq, up0_ps, f2.PS_TAPS, 64, guarded_out=True)
    y1n, s_got = fd.up1_s2d16(y0g, fd.pack_up1_s2d16(np.asarray(w_up1)))
    got = np.asarray(fd.unphase_s2d16(y1n, 64))

    np.testing.assert_allclose(np.asarray(s_got).ravel(),
                               np.asarray(s_want).ravel(), rtol=1e-5)
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, f"max int8 step diff {diff.max()}"
    assert (diff > 0).mean() < 0.01

    # The kernel's in-VMEM reflect guard fill must agree with the pure-JAX
    # reference fill (idempotence: re-filling changes nothing).
    np.testing.assert_array_equal(np.asarray(fd.reflect_guard_ref(y1n)),
                                  np.asarray(y1n))


def _slab_from_map(x):
    """[B,256,256,C] int8 -> zero-guarded s2d-16 slab [B, g+4608+g, 16*C]."""
    b, _, _, c = x.shape
    g = f2.guard_rows(64)
    v = x.reshape(b, 64, 4, 64, 4, c).transpose(0, 1, 3, 2, 4, 5)
    v = v.reshape(b, 64, 64, 16 * c)
    v = jnp.pad(v, ((0, 0), (0, 0), (0, 8), (0, 0)))
    v = v.reshape(b, fd.SROWS, 16 * c)
    return jnp.pad(v, ((0, 0), (g, g), (0, 0)))


def test_reflect_guards_plus_final7_match_xla_reference():
    """reflect_guard_ref-filled slab + final7 == reflect-pad XLA reference,
    exactly, INCLUDING the 3-pixel border (no repair pass)."""
    rng = np.random.default_rng(1)
    x = rng.integers(-127, 128, (B, 256, 256, 64), dtype=np.int8)
    w = rng.integers(-127, 128, (7, 7, 64, 3), dtype=np.int8)
    ws = rng.uniform(0.001, 0.01, 3).astype(np.float32)
    bias = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
    inv_s = rng.uniform(0.005, 0.05, (B, 1, 1)).astype(np.float32)

    slab = fd.reflect_guard_ref(_slab_from_map(jnp.asarray(x)))
    u8 = fd.final7_tanh_u8(slab, fd.pack_final_s2d16(w), jnp.asarray(ws),
                           jnp.asarray(bias), jnp.asarray(inv_s))
    got = np.asarray(fd.unphase_s2d16_u8(u8))

    hi = jnp.pad(jnp.asarray(x), ((0, 0), (3, 3), (3, 3), (0, 0)),
                 mode="reflect")
    y = jax.lax.conv_general_dilated(
        hi, jnp.asarray(w), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    yf = y.astype(jnp.float32) * (ws[None, None, None, :]
                                  * inv_s.reshape(B, 1, 1, 1)) + bias
    want = np.asarray(jnp.clip(jnp.round((jnp.tanh(yf) + 1.0) * 127.5),
                               0, 255).astype(jnp.uint8))
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, f"max uint8 diff {diff.max()}"
    assert (diff > 0).mean() < 1e-3


@pytest.mark.slow
def test_full_uint8_decoder_end_to_end():
    from msig_tpu.config import TrainConfig
    from msig_tpu.infer.quantized import (
        quantize_generator_params,
        quantized_generator_apply,
    )
    from msig_tpu.models.networks import StyleCycleGANGenerator

    cfg = TrainConfig()
    gen = StyleCycleGANGenerator(n_residual_blocks=2)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.integers(0, 256, (1, 256, 256, 3), dtype=np.uint8))
    style = jnp.asarray(rng.normal(size=(1, cfg.style_dim)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 256, 256, 3), jnp.float32),
                      jnp.zeros((1, cfg.style_dim), jnp.float32))
    q = quantize_generator_params(params, 2)
    assert "up1_s16" in q and "final_s16" in q

    f32 = quantized_generator_apply(q, img, style, n_res=2,
                                    out_dtype=jnp.float32, fused_trunk=True)
    want = np.asarray(jnp.clip(jnp.round((f32 + 1.0) * 127.5), 0, 255)
                      .astype(jnp.uint8))
    got = np.asarray(quantized_generator_apply(
        q, img, style, n_res=2, out_dtype=jnp.uint8, fused_trunk=True))
    assert got.dtype == np.uint8 and got.shape == (1, 256, 256, 3)
    # The two decoders requantize up1 with independently-ordered fp32
    # stats, so isolated +-1 int8 flips there spread through the 7x7 conv;
    # gate on PSNR rather than a per-pixel step bound.
    mse = np.mean((got.astype(np.float64) - want.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr >= 40.0, f"uint8-vs-float-path PSNR {psnr:.1f} dB"
