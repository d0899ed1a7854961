"""Architecture tests for the four networks: shapes, gather semantics, dtypes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msig_tpu.models import (
    AdaINResBlock,
    MultiDomainDiscriminator,
    MultiDomainStyleEncoder,
    StyleCycleGANGenerator,
)


def _init_and_apply(mod, *args, seed=0):
    params = mod.init(jax.random.PRNGKey(seed), *args)
    return params, mod.apply(params, *args)


class TestStyleEncoder:
    def test_output_shape(self):
        mod = MultiDomainStyleEncoder(style_dim=64, num_domains=4)
        img = jnp.zeros((3, 64, 64, 3))
        idx = jnp.array([0, 2, 3])
        _, out = _init_and_apply(mod, img, idx)
        assert out.shape == (3, 64)

    def test_gather_selects_correct_branch(self):
        """Per-sample gather == uniform-batch selection of the same domain."""
        mod = MultiDomainStyleEncoder(style_dim=16, num_domains=3)
        img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        params = mod.init(jax.random.PRNGKey(0), img, jnp.array([0, 1]))
        mixed = np.asarray(mod.apply(params, img, jnp.array([2, 1])))
        all2 = np.asarray(mod.apply(params, img, jnp.array([2, 2])))
        all1 = np.asarray(mod.apply(params, img, jnp.array([1, 1])))
        np.testing.assert_allclose(mixed[0], all2[0], rtol=1e-6)
        np.testing.assert_allclose(mixed[1], all1[1], rtol=1e-6)
        assert np.abs(mixed[0] - all1[0]).max() > 1e-5  # branches actually differ

    def test_none_domain_uses_branch_zero(self):
        mod = MultiDomainStyleEncoder(style_dim=8, num_domains=2)
        img = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        params = mod.init(jax.random.PRNGKey(0), img, None)
        a = mod.apply(params, img, None)
        b = mod.apply(params, img, jnp.array([0, 0]))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


class TestGenerator:
    @pytest.mark.parametrize("size", [64, 128])
    def test_output_matches_input_size(self, size):
        mod = StyleCycleGANGenerator(style_dim=32, n_residual_blocks=2)
        img = jnp.zeros((1, size, size, 3))
        style = jnp.zeros((1, 32))
        _, out = _init_and_apply(mod, img, style)
        assert out.shape == (1, size, size, 3)
        assert np.all(np.abs(np.asarray(out)) <= 1.0)  # tanh range

    def test_style_changes_output(self):
        mod = StyleCycleGANGenerator(style_dim=16, n_residual_blocks=1)
        img = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
        params = mod.init(jax.random.PRNGKey(1), img, jnp.zeros((1, 16)))
        s1 = jax.random.normal(jax.random.PRNGKey(2), (1, 16))
        s2 = jax.random.normal(jax.random.PRNGKey(3), (1, 16))
        o1 = mod.apply(params, img, s1)
        o2 = mod.apply(params, img, s2)
        assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-4

    def test_accepts_4d_style(self):
        """Reference squeezes [B,S,1,1] styles (model.py:24-25); we accept [B,1,1,S]."""
        mod = StyleCycleGANGenerator(style_dim=8, n_residual_blocks=1)
        img = jnp.zeros((1, 16, 16, 3))
        s = jnp.ones((1, 8))
        params = mod.init(jax.random.PRNGKey(0), img, s)
        o1 = mod.apply(params, img, s)
        o2 = mod.apply(params, img, s.reshape(1, 1, 1, 8))
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))


class TestDiscriminator:
    def test_patch_output_shape_256(self):
        """256x256 input -> [B,16,16,1] patch map (reference model.py:154-213)."""
        mod = MultiDomainDiscriminator(num_domains=3)
        img = jnp.zeros((2, 256, 256, 3))
        idx = jnp.array([1, 2])
        _, out = _init_and_apply(mod, img, idx)
        assert out.shape == (2, 16, 16, 1)

    def test_gather_matches_single_branch(self):
        mod = MultiDomainDiscriminator(num_domains=4)
        img = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
        params = mod.init(jax.random.PRNGKey(1), img, None)
        none_out = mod.apply(params, img, None)  # branch 0
        idx_out = mod.apply(params, img, jnp.array([0, 0]))
        np.testing.assert_allclose(np.asarray(none_out), np.asarray(idx_out), rtol=1e-5, atol=1e-6)


class TestResBlock:
    def test_residual_path(self):
        """Zeroed convs + zeroed style-mod => output == input (pure residual)."""
        mod = AdaINResBlock(8)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8))
        s = jnp.ones((1, 4))
        params = mod.init(jax.random.PRNGKey(1), x, s)
        zeroed = jax.tree.map(jnp.zeros_like, params)
        out = mod.apply(zeroed, x, s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


class TestDtype:
    def test_bfloat16_compute(self):
        mod = StyleCycleGANGenerator(style_dim=8, n_residual_blocks=1, dtype=jnp.bfloat16)
        img = jnp.zeros((1, 16, 16, 3), jnp.bfloat16)
        s = jnp.zeros((1, 8), jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(0), img, s)
        # params stay fp32, output is bf16
        assert params["params"]["enc_conv0"]["kernel"].dtype == jnp.float32
        out = mod.apply(params, img, s)
        assert out.dtype == jnp.bfloat16
