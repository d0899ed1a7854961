"""Fused int8 encoder kernels vs the XLA quantized encoder chain.

The three Pallas kernels (ops/fused_enc_int8.py) must reproduce, to +-1
int8 step, the sequence used by the XLA quantized path
(msig_tpu/infer/quantized.py): int8 conv -> fp32 instance norm -> ReLU ->
per-sample dynamic requant, for conv0 (7x7 s1 reflect-pad), conv1 and
conv2 (4x4 s2 zero-pad).
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from msig_tpu.ops import fused_enc_int8 as fe

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, dimension_numbers=_DN,
        preferred_element_type=jnp.int32)


def _in_relu_rq(y):
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(1, 2), keepdims=True)
    var = jnp.mean((yf - mean) ** 2, axis=(1, 2), keepdims=True)
    z = jnp.maximum((yf - mean) * jax.lax.rsqrt(var + 1e-5), 0.0)
    amax = jnp.max(jnp.abs(z), axis=(1, 2, 3), keepdims=True)
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    return (jnp.clip(jnp.round(z * s), -127, 127).astype(jnp.int8),
            amax[..., 0] / 127.0)


def _unlayout_1024(o):
    """enc0 output slab -> [B, 256, 256, 64] pixel space (b-major lanes)."""
    b = o.shape[0]
    body = o[:, fe.GUARD:fe.GUARD + fe.SROWS].reshape(b, 64, fe.WP, 1024)[:, :, :64]
    # lanes: [by,bx (2x2)][py,px (2x2)][c 64]
    t = body.reshape(b, 64, 64, 2, 2, 2, 2, 64)
    # pixel (4I + 2*by + py, 4J + 2*bx + px)
    t = t.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # B, I, by, py, J, bx, px, c
    return t.reshape(b, 256, 256, 64)


def _unlayout_512(o):
    """enc1 output slab -> [B, 128, 128, 128] (b-major lanes)."""
    b = o.shape[0]
    body = o[:, fe.GUARD:fe.GUARD + fe.SROWS].reshape(b, 64, fe.WP, 512)[:, :, :64]
    t = body.reshape(b, 64, 64, 2, 2, 128)
    t = t.transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(b, 128, 128, 128)


def _unlayout_256(o):
    b = o.shape[0]
    body = o[:, fe.GUARD:fe.GUARD + fe.SROWS].reshape(b, 64, fe.WP, 256)[:, :, :64]
    return body


@pytest.mark.heavy
def test_full_encoder_chain_matches_xla():
    rng = np.random.default_rng(5)
    b = 2
    img = jnp.asarray(rng.integers(0, 256, (b, 256, 256, 3)), jnp.uint8)
    w0 = rng.integers(-32, 33, (7, 7, 3, 64)).astype(np.int8)
    w1 = rng.integers(-32, 33, (4, 4, 64, 128)).astype(np.int8)
    w2 = rng.integers(-32, 33, (4, 4, 128, 256)).astype(np.int8)

    # XLA reference chain (fp32 IN, identical structure to infer/quantized.py)
    x = (img.astype(jnp.int32) - 128).astype(jnp.int8)
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    q0, _ = _in_relu_rq(_conv(xp, jnp.asarray(w0), 1, ((0, 0), (0, 0))))
    q1, _ = _in_relu_rq(_conv(q0, jnp.asarray(w1), 2, ((1, 1), (1, 1))))
    q2, s2 = _in_relu_rq(_conv(q1, jnp.asarray(w2), 2, ((1, 1), (1, 1))))

    # fused kernels
    slab = fe.prep_s2d4_input(img)
    h0 = fe.enc0_in_relu_requant(slab, fe.pack_enc0(w0))
    g0 = _unlayout_1024(np.asarray(h0))
    d0 = np.abs(g0.astype(np.int32) - np.asarray(q0).astype(np.int32))
    assert d0.max() <= 1 and (d0 > 0).mean() < 0.01, f"enc0: {d0.max()}"

    h1 = fe.enc1_in_relu_requant(h0, fe.pack_enc1(w1))
    g1 = _unlayout_512(np.asarray(h1))
    d1 = np.abs(g1.astype(np.int32) - np.asarray(q1).astype(np.int32))
    assert d1.max() <= 2 and (d1 > 1).mean() < 0.01, f"enc1: {d1.max()}"

    h2, inv_s = fe.enc2_in_relu_requant(h1, fe.pack_enc2(w2))
    g2 = _unlayout_256(np.asarray(h2))
    d2 = np.abs(g2.astype(np.int32) - np.asarray(q2).astype(np.int32))
    # two requant roundings upstream: allow +-3 on rare pixels
    assert d2.max() <= 3 and (d2 > 1).mean() < 0.02, f"enc2: {d2.max()}"
    np.testing.assert_allclose(np.asarray(inv_s).reshape(b),
                               np.asarray(s2).reshape(b), rtol=0.02)


@pytest.mark.heavy
def test_enc1_im2col_matches_phase_packed():
    """Dense-K im2col enc1 == the 9-tap phase-packed kernel, exactly
    (identical integer convs + identical epilogue math)."""
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.integers(0, 256, (2, 256, 256, 3)), jnp.uint8)
    w0 = rng.integers(-32, 33, (7, 7, 3, 64)).astype(np.int8)
    w1 = rng.integers(-32, 33, (4, 4, 64, 128)).astype(np.int8)

    slab = fe.prep_s2d4_input(img)
    h0 = fe.enc0_in_relu_requant(slab, fe.pack_enc0(w0))
    a = fe.enc1_in_relu_requant(h0, fe.pack_enc1(w1))
    b = fe.enc1_in_relu_requant_im2col(h0, fe.pack_enc1_im2col(w1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
