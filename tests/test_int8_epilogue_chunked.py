"""Chunked fused epilogue vs the plain reference (interpret mode)."""

import numpy as np

import jax.numpy as jnp

from msig_tpu.ops.int8_epilogue_chunked import adain_relu_requant_chunked, supported


def _ref(x_i32, g, b, eps=1e-5):
    x = np.asarray(x_i32, np.float32)
    m = x.mean(axis=1, keepdims=True)
    v = ((x - m) ** 2).mean(axis=1, keepdims=True)
    y = np.maximum((x - m) / np.sqrt(v + eps) * g[:, None, :] + b[:, None, :], 0)
    amax = np.max(y, axis=(1, 2), keepdims=True)
    scale = np.where(amax > 0, 127.0 / amax, 1.0)
    return np.clip(np.round(y * scale), -127, 127).astype(np.int8)


class TestChunked:
    def test_supported(self):
        assert supported((1, 4096, 256))
        assert supported((1, 65536, 128))  # big S fine (chunked)
        assert not supported((1, 4096, 64))

    def test_matches_reference_multi_chunk(self):
        rng = np.random.default_rng(0)
        x = rng.integers(-3000, 3000, (2, 1024, 128)).astype(np.int32)
        g = rng.standard_normal((2, 128)).astype(np.float32)
        b = rng.standard_normal((2, 128)).astype(np.float32)
        got = np.asarray(adain_relu_requant_chunked(
            jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), chunk=256))
        want = _ref(x, g, b)
        diff = np.abs(got.astype(int) - want.astype(int))
        assert (diff <= 1).all()
        assert (diff == 0).mean() > 0.99

    def test_single_chunk_case(self):
        rng = np.random.default_rng(1)
        x = rng.integers(-500, 500, (1, 64, 128)).astype(np.int32)
        g = np.ones((1, 128), np.float32)
        b = np.zeros((1, 128), np.float32)
        got = np.asarray(adain_relu_requant_chunked(
            jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), chunk=512))
        want = _ref(x, g, b)
        assert (np.abs(got.astype(int) - want.astype(int)) <= 1).all()
