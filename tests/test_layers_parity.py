"""Numerics parity of primitive layers vs torch CPU reference semantics.

These tests pin our NHWC/JAX layers to the exact torch ops the reference
delegates to (Conv2d, ConvTranspose2d, InstanceNorm2d, Linear, LeakyReLU),
including reflect padding and transposed-conv output-size semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from msig_tpu.models.layers import TorchConv, TorchConvTranspose, TorchDense, leaky_relu
from msig_tpu.ops.norm import adain_modulate, instance_norm

RTOL, ATOL = 1e-4, 1e-5


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def _to_torch_nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _from_torch_nchw(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


class TestConv:
    @pytest.mark.parametrize("stride,pad", [(1, 1), (2, 1), (1, 3)])
    def test_matches_torch_conv2d(self, stride, pad):
        x = _rand(2, 16, 16, 3)
        w = _rand(4, 4, 3, 8, seed=1)  # HWIO
        b = _rand(8, seed=2)

        mod = TorchConv(8, 4, strides=stride, padding=pad)
        params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
        got = np.asarray(mod.apply(params, jnp.asarray(x)))

        tw = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))  # OIHW
        want = _from_torch_nchw(
            F.conv2d(_to_torch_nchw(x), tw, torch.from_numpy(b), stride=stride, padding=pad)
        )
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_reflect_padding_matches_torch(self):
        x = _rand(1, 8, 8, 3)
        w = _rand(7, 7, 3, 4, seed=1)
        mod = TorchConv(4, 7, padding=3, pad_mode="reflect", use_bias=False)
        params = {"params": {"kernel": jnp.asarray(w)}}
        got = np.asarray(mod.apply(params, jnp.asarray(x)))

        tx = F.pad(_to_torch_nchw(x), (3, 3, 3, 3), mode="reflect")
        tw = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))
        want = _from_torch_nchw(F.conv2d(tx, tw))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


class TestConvTranspose:
    def test_matches_torch_conv_transpose2d(self):
        """k=4, s=2, p=1 — the generator's upsampling config (2x output)."""
        x = _rand(2, 8, 8, 6)
        torch_w = _rand(6, 4, 4, 4, seed=1)  # torch convT weight [cin, cout, kh, kw]
        b = _rand(4, seed=2)

        # our stored kernel = flip(transpose(W, (2,3,0,1)), (0,1))
        jax_w = np.flip(np.transpose(torch_w, (2, 3, 0, 1)), axis=(0, 1)).copy()
        mod = TorchConvTranspose(4, 4, strides=2, padding=1)
        params = {"params": {"kernel": jnp.asarray(jax_w), "bias": jnp.asarray(b)}}
        got = np.asarray(mod.apply(params, jnp.asarray(x)))
        assert got.shape == (2, 16, 16, 4)

        want = _from_torch_nchw(
            F.conv_transpose2d(
                _to_torch_nchw(x), torch.from_numpy(torch_w), torch.from_numpy(b),
                stride=2, padding=1,
            )
        )
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


class TestNorms:
    def test_instance_norm_matches_torch(self):
        x = _rand(3, 9, 7, 5)
        got = np.asarray(instance_norm(jnp.asarray(x)))
        want = _from_torch_nchw(F.instance_norm(_to_torch_nchw(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_adain_matches_manual(self):
        x = _rand(2, 6, 6, 4)
        gamma = _rand(2, 4, seed=1)
        beta = _rand(2, 4, seed=2)
        got = np.asarray(adain_modulate(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))
        tin = F.instance_norm(_to_torch_nchw(x))
        tg = torch.from_numpy(gamma).view(2, 4, 1, 1)
        tb = torch.from_numpy(beta).view(2, 4, 1, 1)
        want = _from_torch_nchw(tg * tin + tb)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestDenseAndActivations:
    def test_dense_matches_torch_linear(self):
        x = _rand(5, 12)
        w = _rand(12, 7, seed=1)
        b = _rand(7, seed=2)
        mod = TorchDense(7)
        params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
        got = np.asarray(mod.apply(params, jnp.asarray(x)))
        want = (F.linear(torch.from_numpy(x), torch.from_numpy(w.T), torch.from_numpy(b))).numpy()
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_leaky_relu(self):
        x = _rand(4, 4)
        got = np.asarray(leaky_relu(jnp.asarray(x), 0.2))
        want = F.leaky_relu(torch.from_numpy(x), 0.2).numpy()
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


class TestInitDistributions:
    def test_conv_init_bound(self):
        mod = TorchConv(64, 4, strides=2, padding=1)
        params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 32)))
        k = np.asarray(params["params"]["kernel"])
        bound = 1.0 / np.sqrt(4 * 4 * 32)
        assert np.abs(k).max() <= bound
        assert np.abs(k).max() > 0.8 * bound  # actually fills the range
