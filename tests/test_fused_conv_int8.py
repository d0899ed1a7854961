"""Fused int8 conv3x3 + AdaIN/ReLU/requant Pallas kernel vs the XLA chain.

The kernel must reproduce, to +-1 int8 step, the exact sequence used by the
XLA quantized path (msig_tpu/infer/quantized.py):
    y   = conv3x3_int8(x, w)                      # zero pad 1, stride 1
    out = requant(relu(adain_modulate(y)))        # per-sample dynamic scale
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msig_tpu.ops import fused_conv_int8 as fc
from msig_tpu.ops.norm import adain_modulate

_DN = ("NHWC", "HWIO", "NHWC")


def _xla_reference(x_i8, w_i8, gamma, beta):
    y = jax.lax.conv_general_dilated(
        x_i8, w_i8, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=_DN, preferred_element_type=jnp.int32,
    )
    z = jnp.maximum(adain_modulate(y.astype(jnp.float32), gamma, beta), 0.0)
    amax = jnp.max(jnp.abs(z), axis=(1, 2, 3), keepdims=True)
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    return jnp.clip(jnp.round(z * s), -127, 127).astype(jnp.int8)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.heavy
def test_matches_xla_chain(seed):
    rng = np.random.default_rng(seed)
    b, c = 2, 256
    x = rng.integers(-127, 128, (b, 64, 64, c), dtype=np.int8)
    w = rng.integers(-32, 33, (3, 3, c, c), dtype=np.int8)
    gamma = rng.normal(1.0, 0.5, (b, c)).astype(np.float32)
    beta = rng.normal(0.0, 0.5, (b, c)).astype(np.float32)

    ref = np.asarray(_xla_reference(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(gamma), jnp.asarray(beta)))

    xq = fc.pad_to_rows(jnp.asarray(x).reshape(b, fc.SROWS, c))
    out = fc.conv3x3_adain_relu_requant(
        xq, fc.pack_weights(jnp.asarray(w)), jnp.asarray(gamma), jnp.asarray(beta)
    )
    out = np.asarray(out)

    # guards zeroed
    assert not out[:, : fc.GUARD].any()
    assert not out[:, fc.GUARD + fc.SROWS:].any()

    got = out[:, fc.GUARD: fc.GUARD + fc.SROWS].reshape(b, 64, 64, c)
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    # identical up to one int8 step of rounding disagreement
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


@pytest.mark.parametrize("w_img,cin,cout,guard", [(64, 256, 128, 128)])
def test_convt_up_site_matches_xla_chain(w_img, cin, cout, guard):
    """Upsampling site: ConvT4x4s2 -> IN -> ReLU -> requant vs lax ops."""
    from msig_tpu.ops.norm import instance_norm

    rng = np.random.default_rng(3)
    b = 1
    x = rng.integers(-127, 128, (b, w_img, w_img, cin), dtype=np.int8)
    w = rng.integers(-16, 17, (4, 4, cin, cout), dtype=np.int8)

    # reference: the XLA path from msig_tpu/infer/quantized.py
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    z = jnp.maximum(instance_norm(y.astype(jnp.float32)), 0.0)
    amax = jnp.max(jnp.abs(z), axis=(1, 2, 3), keepdims=True)
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    ref_q = np.asarray(jnp.clip(jnp.round(z * s), -127, 127).astype(jnp.int8))
    ref_s = np.asarray(amax / 127.0).reshape(b)

    xq = fc.pad_rows(jnp.asarray(x).reshape(b, w_img * w_img, cin), guard)
    wp = fc.pack_convt_weights(jnp.asarray(w), cin, cout)
    out, out_s = fc.convt4x4s2_in_relu_requant(xq, wp, w_img, guard)
    # un-phase the s2d layout: [srows, 4*cout] -> [2*w, 2*w, cout]
    got = np.asarray(out).reshape(b, w_img, w_img, 2, 2, cout)
    got = got.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * w_img, 2 * w_img, cout)

    np.testing.assert_allclose(np.asarray(out_s).reshape(b), ref_s, rtol=1e-5)
    diff = np.abs(got.astype(np.int32) - ref_q.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


@pytest.mark.heavy
def test_residual_site_matches_xla_chain():
    """conv2 site: conv -> adain -> +residual -> requant, vs the XLA ops."""
    rng = np.random.default_rng(7)
    b, c = 1, 256
    y1 = rng.integers(-127, 128, (b, 64, 64, c), dtype=np.int8)
    h = rng.normal(0, 1.5, (b, 64, 64, c)).astype(np.float32)
    w = rng.integers(-32, 33, (3, 3, c, c), dtype=np.int8)
    gamma = rng.normal(1.0, 0.5, (b, c)).astype(np.float32)
    beta = rng.normal(0.0, 0.5, (b, c)).astype(np.float32)

    # quantize the residual carry exactly as the fused trunk does
    amax_h = np.abs(h).max(axis=(1, 2, 3), keepdims=True)
    hs = (amax_h / 127.0).astype(np.float32)
    hq = np.clip(np.round(h / hs), -127, 127).astype(np.int8)
    h_deq = hq.astype(np.float32) * hs  # what the kernel actually sees

    y = jax.lax.conv_general_dilated(
        jnp.asarray(y1), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=_DN, preferred_element_type=jnp.int32)
    z = adain_modulate(y.astype(jnp.float32), jnp.asarray(gamma), jnp.asarray(beta))
    hn = z + jnp.asarray(h_deq)
    amax = jnp.max(jnp.abs(hn), axis=(1, 2, 3), keepdims=True)
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    ref_q = np.asarray(jnp.clip(jnp.round(hn * s), -127, 127).astype(jnp.int8))
    ref_s = np.asarray(amax / 127.0).reshape(b, 1)

    y1q = fc.pad_to_rows(jnp.asarray(y1).reshape(b, fc.SROWS, c))
    hq_p = fc.pad_to_rows(jnp.asarray(hq).reshape(b, fc.SROWS, c))
    out_q, out_s = fc.conv3x3_adain_residual_requant(
        y1q, hq_p, jnp.asarray(hs).reshape(b, 1),
        fc.pack_weights(jnp.asarray(w)), jnp.asarray(gamma), jnp.asarray(beta))
    got_q = np.asarray(out_q)[:, fc.GUARD:fc.GUARD + fc.SROWS].reshape(b, 64, 64, c)
    got_s = np.asarray(out_s).reshape(b, 1)

    np.testing.assert_allclose(got_s, ref_s, rtol=1e-5)
    diff = np.abs(got_q.astype(np.int32) - ref_q.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


# ---------------------------------------------------------------- v2 layout


@pytest.mark.heavy
def test_v2_relu_site_matches_xla_chain():
    from msig_tpu.ops import fused_conv_int8_v2 as f2

    rng = np.random.default_rng(11)
    b, c = 2, 256
    x = rng.integers(-127, 128, (b, 64, 64, c), dtype=np.int8)
    w = rng.integers(-32, 33, (3, 3, c, c), dtype=np.int8)
    gamma = rng.normal(1.0, 0.5, (b, c)).astype(np.float32)
    beta = rng.normal(0.0, 0.5, (b, c)).astype(np.float32)

    ref = np.asarray(_xla_reference(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(gamma), jnp.asarray(beta)))

    xq = f2.to_padded_rows(jnp.asarray(x))
    out = f2.conv3x3_adain_relu_requant(
        xq, fc.pack_weights(jnp.asarray(w)), jnp.asarray(gamma),
        jnp.asarray(beta), w_img=64)
    out = np.asarray(out)
    wp, srows, _, _ = f2.geometry(64)
    assert not out[:, : f2.GUARD].any()
    assert not out[:, f2.GUARD + srows:].any()
    body = out[:, f2.GUARD: f2.GUARD + srows].reshape(b, 64, wp, c)
    assert not body[:, :, 64:].any()  # guard cols zeroed
    got = body[:, :, :64]
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


@pytest.mark.heavy
def test_v2_residual_site_matches_xla_chain():
    from msig_tpu.ops import fused_conv_int8_v2 as f2

    rng = np.random.default_rng(12)
    b, c = 1, 256
    y1 = rng.integers(-127, 128, (b, 64, 64, c), dtype=np.int8)
    h = rng.normal(0, 1.5, (b, 64, 64, c)).astype(np.float32)
    w = rng.integers(-32, 33, (3, 3, c, c), dtype=np.int8)
    gamma = rng.normal(1.0, 0.5, (b, c)).astype(np.float32)
    beta = rng.normal(0.0, 0.5, (b, c)).astype(np.float32)

    amax_h = np.abs(h).max(axis=(1, 2, 3), keepdims=True)
    hs = (amax_h / 127.0).astype(np.float32)
    hq = np.clip(np.round(h / hs), -127, 127).astype(np.int8)
    h_deq = hq.astype(np.float32) * hs

    y = jax.lax.conv_general_dilated(
        jnp.asarray(y1), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=_DN, preferred_element_type=jnp.int32)
    z = adain_modulate(y.astype(jnp.float32), jnp.asarray(gamma), jnp.asarray(beta))
    hn = z + jnp.asarray(h_deq)
    amax = jnp.max(jnp.abs(hn), axis=(1, 2, 3), keepdims=True)
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    ref_q = np.asarray(jnp.clip(jnp.round(hn * s), -127, 127).astype(jnp.int8))
    ref_s = np.asarray(amax / 127.0).reshape(b, 1)

    y1q = f2.to_padded_rows(jnp.asarray(y1))
    hq_p = f2.to_padded_rows(jnp.asarray(hq))
    out_q, out_s = f2.conv3x3_adain_residual_requant(
        y1q, hq_p, jnp.asarray(hs).reshape(b, 1),
        fc.pack_weights(jnp.asarray(w)), jnp.asarray(gamma), jnp.asarray(beta),
        w_img=64)
    wp, srows, _, _ = f2.geometry(64)
    got = np.asarray(out_q)[:, f2.GUARD:f2.GUARD + srows].reshape(b, 64, wp, c)
    got_q = got[:, :, :64]
    got_s = np.asarray(out_s).reshape(b, 1)

    np.testing.assert_allclose(got_s, ref_s, rtol=1e-5)
    diff = np.abs(got_q.astype(np.int32) - ref_q.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


@pytest.mark.parametrize("w_img,cin,cout", [(64, 256, 128), (128, 128, 64)])
@pytest.mark.heavy
def test_v2_convt_up_site_matches_xla_chain(w_img, cin, cout):
    from msig_tpu.ops import fused_conv_int8_v2 as f2
    from msig_tpu.ops.norm import instance_norm

    rng = np.random.default_rng(13)
    b = 1
    x = rng.integers(-127, 128, (b, w_img, w_img, cin), dtype=np.int8)
    w = rng.integers(-16, 17, (4, 4, cin, cout), dtype=np.int8)

    y = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    z = jnp.maximum(instance_norm(y.astype(jnp.float32)), 0.0)
    amax = jnp.max(jnp.abs(z), axis=(1, 2, 3), keepdims=True)
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    ref_q = np.asarray(jnp.clip(jnp.round(z * s), -127, 127).astype(jnp.int8))
    ref_s = np.asarray(amax / 127.0).reshape(b)

    xq = f2.to_padded_rows(jnp.asarray(x))
    wp = fc.pack_convt_weights(jnp.asarray(w), cin, cout)
    out, out_s = f2.convt4x4s2_in_relu_requant(xq, wp, w_img)
    got = np.asarray(f2.unphase_s2d(out, w_img, cout))

    np.testing.assert_allclose(np.asarray(out_s).reshape(b), ref_s, rtol=1e-5)
    diff = np.abs(got.astype(np.int32) - ref_q.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


@pytest.mark.parametrize("w_img,cin,cout", [(64, 256, 128), (128, 128, 64)])
def test_v2_convt_phase_split_matches_9tap(w_img, cin, cout):
    """Phase-split ConvT kernel == the 9-tap v2 kernel, bit for bit."""
    from msig_tpu.ops import fused_conv_int8_v2 as f2

    rng = np.random.default_rng(21)
    b = 1
    x = rng.integers(-127, 128, (b, w_img, w_img, cin), dtype=np.int8)
    w = rng.integers(-16, 17, (4, 4, cin, cout), dtype=np.int8)

    xq = f2.to_padded_rows(jnp.asarray(x))
    w9 = fc.pack_convt_weights(jnp.asarray(w), cin, cout)
    ref_q, ref_s = f2.convt4x4s2_in_relu_requant(xq, w9, w_img)

    wps, taps = f2.pack_convt_weights_ps(jnp.asarray(w), cin, cout)
    got_q, got_s = f2.convt4x4s2_in_relu_requant_ps(xq, wps, taps, w_img)

    # +-1 int8 step: the slim epilogue's MXU-offloaded fp32 sums reassociate
    # differently depending on the surrounding graph (~1e-6 of elements).
    d = np.abs(np.asarray(got_q, np.int32) - np.asarray(ref_q, np.int32))
    assert d.max() <= 1 and (d > 0).mean() < 1e-4
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-5)


@pytest.mark.heavy
def test_v2_relu_site_128_matches_xla_chain():
    """512^2 trunk geometry: relu site on 128x128 maps (w_img=128)."""
    from msig_tpu.ops import fused_conv_int8_v2 as f2

    rng = np.random.default_rng(31)
    b, c, wimg = 1, 256, 128
    x = rng.integers(-127, 128, (b, wimg, wimg, c), dtype=np.int8)
    w = rng.integers(-32, 33, (3, 3, c, c), dtype=np.int8)
    gamma = rng.normal(1.0, 0.5, (b, c)).astype(np.float32)
    beta = rng.normal(0.0, 0.5, (b, c)).astype(np.float32)

    ref = np.asarray(_xla_reference(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(gamma), jnp.asarray(beta)))

    xq = f2.to_padded_rows(jnp.asarray(x))
    out = np.asarray(f2.conv3x3_adain_relu_requant(
        xq, fc.pack_weights(jnp.asarray(w)), jnp.asarray(gamma),
        jnp.asarray(beta), w_img=wimg))
    wp, srows, _, _ = f2.geometry(wimg)
    g = f2.guard_rows(wimg)
    got = out[:, g:g + srows].reshape(b, wimg, wp, c)[:, :, :wimg]
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


@pytest.mark.heavy
def test_v2_residual_hifi2_site_matches_xla_chain():
    """Error-plane conv2 site: 2x-int8 residual carry (VERDICT r4 #2).

    (q1 + q2/254) * scale must reconstruct the fp32 chain value to
    ~scale/254 (15-bit carry), i.e. strictly tighter than both the stock
    int8 carry (scale/1) and the bf16 carry (8-bit mantissa).
    """
    from msig_tpu.ops import fused_conv_int8_v2 as f2

    rng = np.random.default_rng(13)
    b, c = 1, 256
    y1 = rng.integers(-127, 128, (b, 64, 64, c), dtype=np.int8)
    h1 = rng.integers(-127, 128, (b, 64, 64, c), dtype=np.int8)
    h2 = rng.integers(-127, 128, (b, 64, 64, c), dtype=np.int8)
    hs = np.float32(0.0173)
    w = rng.integers(-32, 33, (3, 3, c, c), dtype=np.int8)
    gamma = rng.normal(1.0, 0.5, (b, c)).astype(np.float32)
    beta = rng.normal(0.0, 0.5, (b, c)).astype(np.float32)

    y = jax.lax.conv_general_dilated(
        jnp.asarray(y1), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=_DN, preferred_element_type=jnp.int32)
    z = adain_modulate(y.astype(jnp.float32), jnp.asarray(gamma), jnp.asarray(beta))
    hf = (jnp.asarray(h1, jnp.float32) + jnp.asarray(h2, jnp.float32) / 254.0) * hs
    hn = np.asarray(z + hf)
    amax = np.abs(hn).max(axis=(1, 2, 3), keepdims=True)

    wp, srows, _, _ = f2.geometry(64)
    g = f2.GUARD
    y1q = f2.to_padded_rows(jnp.asarray(y1))
    h1q = f2.to_padded_rows(jnp.asarray(h1))
    h2q = f2.to_padded_rows(jnp.asarray(h2))
    o1, o2, os_ = f2.conv3x3_adain_residual_hifi2(
        y1q, h1q, h2q, jnp.full((b, 1), hs, jnp.float32),
        fc.pack_weights(jnp.asarray(w)), jnp.asarray(gamma),
        jnp.asarray(beta), w_img=64)

    def unpack(o, dt):
        return np.asarray(o, dt)[:, g:g + srows].reshape(b, 64, wp, c)[:, :, :64]

    q1 = unpack(o1, np.float32)
    q2 = unpack(o2, np.float32)
    scale = np.asarray(os_).reshape(b, 1, 1, 1)
    np.testing.assert_allclose(scale, amax / 127.0, rtol=2e-2)
    recon = (q1 + q2 / 254.0) * scale
    # conv accumulation-order noise + the 15-bit carry quantization
    err = np.abs(recon - hn)
    assert err.max() <= scale.max() / 254.0 + 2e-2 * np.abs(hn).max() / 127.0 + 1e-3
    # the error-plane carry beats the stock int8 carry by >= 32x in RMS
    stock_q = np.clip(np.round(hn / scale), -127, 127) * scale
    assert np.sqrt((err ** 2).mean()) < np.sqrt(
        ((stock_q - hn) ** 2).mean()) / 32.0
    # h1 alone must equal the stock-style quantization (feeds next conv1)
    np.testing.assert_allclose(q1, np.clip(np.round(hn / scale), -127, 127),
                               atol=1.0)
    # guards zeroed in both planes
    assert not np.asarray(o1)[:, :g].any()
    assert not np.asarray(o2)[:, :g].any()


@pytest.mark.heavy
def test_v2_residual_hifi_site_matches_xla_chain():
    """Hi-fi conv2 site: bf16 residual carry in/out, int8 conv-input copy.

    The residual enters and leaves as bf16 (never int8-quantized); only
    the int8 output is a quantization — of exactly the bf16 carry.
    """
    from msig_tpu.ops import fused_conv_int8_v2 as f2

    rng = np.random.default_rng(12)
    b, c = 1, 256
    y1 = rng.integers(-127, 128, (b, 64, 64, c), dtype=np.int8)
    h = rng.normal(0, 1.5, (b, 64, 64, c)).astype(np.float32)
    w = rng.integers(-32, 33, (3, 3, c, c), dtype=np.int8)
    gamma = rng.normal(1.0, 0.5, (b, c)).astype(np.float32)
    beta = rng.normal(0.0, 0.5, (b, c)).astype(np.float32)
    hb = jnp.asarray(h).astype(jnp.bfloat16)

    y = jax.lax.conv_general_dilated(
        jnp.asarray(y1), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=_DN, preferred_element_type=jnp.int32)
    z = adain_modulate(y.astype(jnp.float32), jnp.asarray(gamma), jnp.asarray(beta))
    hn = z + hb.astype(jnp.float32)
    amax = jnp.max(jnp.abs(hn), axis=(1, 2, 3), keepdims=True)
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    ref_hb = np.asarray(hn.astype(jnp.bfloat16).astype(jnp.float32))
    ref_q = np.asarray(jnp.clip(
        jnp.round(jnp.asarray(ref_hb) * s), -127, 127).astype(jnp.int8))

    wp, srows, _, _ = f2.geometry(64)
    y1q = f2.to_padded_rows(jnp.asarray(y1))
    # bf16 carry in the same guard-padded row layout as the int8 slabs
    hb_rows = jnp.zeros((b, 2 * f2.GUARD + srows, c), jnp.bfloat16)
    hb_rows = hb_rows.at[:, f2.GUARD:f2.GUARD + srows].set(
        jnp.pad(hb, ((0, 0), (0, 0), (0, 8), (0, 0))).reshape(b, srows, c))
    out_q, out_hb = f2.conv3x3_adain_residual_hifi(
        y1q, hb_rows, fc.pack_weights(jnp.asarray(w)), jnp.asarray(gamma),
        jnp.asarray(beta), w_img=64)

    got = np.asarray(out_q)[:, f2.GUARD:f2.GUARD + srows].reshape(b, 64, wp, c)
    got_q = got[:, :, :64]
    got_hb = np.asarray(out_hb.astype(jnp.float32))[
        :, f2.GUARD:f2.GUARD + srows].reshape(b, 64, wp, c)[:, :, :64]

    # bf16 carry: identical up to fp32 accumulation order inside the conv
    np.testing.assert_allclose(got_hb, ref_hb, rtol=2e-2, atol=2e-2)
    diff = np.abs(got_q.astype(np.int32) - ref_q.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01
    # guards zeroed in both outputs
    assert not np.asarray(out_q)[:, :f2.GUARD].any()
    assert not np.asarray(out_hb.astype(jnp.float32))[:, :f2.GUARD].any()
