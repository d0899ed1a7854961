"""Pallas fused AdaIN kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msig_tpu.ops import adain_pallas as ap
from msig_tpu.ops.norm import _adain_xla


def _data(b=2, h=8, w=8, c=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, c)).astype(np.float32))
    be = jnp.asarray(rng.standard_normal((b, c)).astype(np.float32))
    return x, g, be


class TestSupported:
    def test_gating(self):
        assert ap.supported(jnp.zeros((1, 8, 8, 128)))
        assert ap.supported(jnp.zeros((1, 8, 8, 256), jnp.bfloat16))
        assert not ap.supported(jnp.zeros((1, 8, 8, 64)))  # C not multiple of 128
        assert not ap.supported(jnp.zeros((8, 8, 128)))  # not 4D
        assert not ap.supported(jnp.zeros((1, 256, 256, 128)))  # slab > VMEM budget


class TestForward:
    def test_matches_xla(self):
        x, g, b = _data()
        got = np.asarray(ap.adain_pallas(x, g, b))
        want = np.asarray(_adain_xla(x, g, b, 1e-5))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_multi_channel_tiles(self):
        x, g, b = _data(c=256)
        got = np.asarray(ap.adain_pallas(x, g, b))
        want = np.asarray(_adain_xla(x, g, b, 1e-5))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_bfloat16(self):
        x, g, b = _data()
        got = np.asarray(ap.adain_pallas(x.astype(jnp.bfloat16), g, b)).astype(np.float32)
        want = np.asarray(_adain_xla(x.astype(jnp.bfloat16), g, b, 1e-5)).astype(np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


class TestBackward:
    def test_grads_match_xla_autodiff(self):
        x, g, b = _data()

        def loss_pallas(x, g, b):
            return jnp.sum(jnp.sin(ap.adain_pallas(x, g, b)))

        def loss_xla(x, g, b):
            return jnp.sum(jnp.sin(_adain_xla(x, g, b, 1e-5)))

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, g, b)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, g, b)
        for a, w, name in zip(gp, gx, ("dx", "dgamma", "dbeta")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(w), rtol=1e-3, atol=1e-4, err_msg=name
            )

    def test_grad_through_dispatcher(self):
        """adain_modulate(use_pallas=True) is differentiable end-to-end."""
        from msig_tpu.ops.norm import adain_modulate

        x, g, b = _data()
        val = jax.grad(lambda x: jnp.sum(adain_modulate(x, g, b, use_pallas=True) ** 2))(x)
        assert np.isfinite(np.asarray(val)).all()
