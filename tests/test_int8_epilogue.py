"""Fused int8 epilogue kernels vs the plain jnp reference (interpret mode)."""

import numpy as np

import jax.numpy as jnp

from msig_tpu.ops.int8_epilogue import (
    adain_relu_requant,
    adain_residual_requant,
    supported,
)


def _ref_norm_mod(x_i32, gamma, beta, eps=1e-5):
    x = np.asarray(x_i32, np.float32)
    m = x.mean(axis=1, keepdims=True)
    v = ((x - m) ** 2).mean(axis=1, keepdims=True)
    return (x - m) / np.sqrt(v + eps) * gamma[:, None, :] + beta[:, None, :]


def _ref_requant(y):
    amax = np.max(np.abs(y), axis=(1, 2), keepdims=True)
    scale = np.where(amax > 0, 127.0 / amax, 1.0)
    return np.clip(np.round(y * scale), -127, 127).astype(np.int8)


def _data(b=2, s=64, c=128, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(-2000, 2000, (b, s, c)).astype(np.int32)
    g = rng.standard_normal((b, c)).astype(np.float32)
    be = rng.standard_normal((b, c)).astype(np.float32)
    return x, g, be


class TestSupported:
    def test_gating(self):
        assert supported((1, 4096, 256))
        assert not supported((1, 65536, 64))  # C not 128-multiple
        assert not supported((1, 65536, 256))  # slab too big


class TestReluRequant:
    def test_matches_reference(self):
        x, g, b = _data()
        got = np.asarray(adain_relu_requant(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b)))
        want = _ref_requant(np.maximum(_ref_norm_mod(x, g, b), 0))
        # int8 rounding boundaries: allow off-by-one on a tiny fraction
        diff = np.abs(got.astype(int) - want.astype(int))
        assert (diff <= 1).all()
        assert (diff == 0).mean() > 0.99

    def test_identity_style_is_plain_in_relu(self):
        x, _, _ = _data(seed=3)
        ones = np.ones((2, 128), np.float32)
        zeros = np.zeros((2, 128), np.float32)
        got = np.asarray(adain_relu_requant(jnp.asarray(x), jnp.asarray(ones), jnp.asarray(zeros)))
        want = _ref_requant(np.maximum(_ref_norm_mod(x, ones, zeros), 0))
        assert (np.abs(got.astype(int) - want.astype(int)) <= 1).all()


class TestResidualRequant:
    def test_matches_reference(self):
        x, g, b = _data(seed=1)
        rng = np.random.default_rng(9)
        res = rng.standard_normal((2, 64, 128)).astype(np.float32)
        h, o = adain_residual_requant(
            jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), jnp.asarray(res)
        )
        want_h = _ref_norm_mod(x, g, b) + res
        np.testing.assert_allclose(np.asarray(h), want_h, rtol=1e-3, atol=1e-3)
        want_o = _ref_requant(want_h)
        assert (np.abs(np.asarray(o).astype(int) - want_o.astype(int)) <= 1).all()
