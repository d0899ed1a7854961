"""Extension tests: mapping network, R1 penalty, R1-enabled train step."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from msig_tpu.extensions import MappingNetwork, r1_penalty
from msig_tpu.models import MultiDomainDiscriminator


class TestMappingNetwork:
    def test_shapes_and_gather(self):
        mod = MappingNetwork(latent_dim=8, style_dim=16, num_domains=3)
        z = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
        params = mod.init(jax.random.PRNGKey(1), z, jnp.zeros((4,), jnp.int32))
        out = mod.apply(params, z, jnp.asarray([0, 1, 2, 1]))
        assert out.shape == (4, 16)
        # per-sample gather == uniform selection
        all1 = np.asarray(mod.apply(params, z, jnp.ones((4,), jnp.int32)))
        mixed = np.asarray(out)
        np.testing.assert_allclose(mixed[1], all1[1], rtol=1e-6)
        np.testing.assert_allclose(mixed[3], all1[3], rtol=1e-6)

    def test_different_domains_differ(self):
        mod = MappingNetwork(latent_dim=8, style_dim=16, num_domains=2)
        z = jax.random.normal(jax.random.PRNGKey(0), (1, 8))
        params = mod.init(jax.random.PRNGKey(1), z, None)
        a = np.asarray(mod.apply(params, z, jnp.asarray([0])))
        b = np.asarray(mod.apply(params, z, jnp.asarray([1])))
        assert np.abs(a - b).max() > 1e-5


class TestStyleRecon:
    @pytest.mark.heavy
    def test_style_recon_adds_term(self):
        from msig_tpu.config import TrainConfig
        from msig_tpu.losses import init_vgg_params
        from msig_tpu.train import (
            Models, create_train_state, current_loss_weights, make_optimizers,
            make_train_step, weights_vector,
        )

        cfg = TrainConfig(image_size=32, batch_size=2, style_dim=16,
                          n_residual_blocks=1, use_pallas=False)
        models = Models.from_config(cfg, num_domains=2)
        state = create_train_state(cfg, models, jax.random.PRNGKey(0))
        vgg = init_vgg_params()
        tx_g, tx_d = make_optimizers(cfg)
        rng = np.random.default_rng(0)
        batch = {
            "source": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)),
            "target": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)),
            "source_domain": jnp.zeros((2,), jnp.int32),
            "target_domain": jnp.ones((2,), jnp.int32),
        }
        w = jnp.asarray(weights_vector(current_loss_weights(cfg.loss_weights, 0)), jnp.float32)
        args = (jnp.float32(0.0), jnp.float32(0.0), w)
        base = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta))
        with_sr = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta,
                                          style_recon_weight=2.0))
        _, m0 = base(state, batch, vgg, *args)
        _, m1 = with_sr(state, batch, vgg, *args)
        assert "style_recon" not in m0
        assert float(m1["style_recon"]) > 0
        assert float(m1["G_loss"]) > float(m0["G_loss"])


class TestDiversity:
    @pytest.mark.heavy
    def test_diversity_loss_negative_and_gates(self):
        from msig_tpu.config import TrainConfig
        from msig_tpu.losses import init_vgg_params
        from msig_tpu.train import (
            Models, create_train_state, current_loss_weights, make_optimizers,
            make_train_step, weights_vector,
        )

        cfg = TrainConfig(image_size=32, batch_size=2, style_dim=16,
                          n_residual_blocks=1, use_pallas=False)
        models = Models.from_config(cfg, num_domains=2)
        state = create_train_state(cfg, models, jax.random.PRNGKey(0))
        vgg = init_vgg_params()
        tx_g, tx_d = make_optimizers(cfg)
        rng = np.random.default_rng(0)
        batch = {
            "source": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)),
            "target": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)),
            "target2": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)),
            "source_domain": jnp.zeros((2,), jnp.int32),
            "target_domain": jnp.ones((2,), jnp.int32),
        }
        w = jnp.asarray(weights_vector(current_loss_weights(cfg.loss_weights, 0)), jnp.float32)
        step = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta,
                                       diversity_weight=1.0))
        _, m = step(state, batch, vgg, jnp.float32(0.0), jnp.float32(0.0), w)
        assert float(m["diversity"]) < 0  # -L1 of two distinct-style outputs

    def test_loader_second_target(self, tmp_path):
        from PIL import Image

        from msig_tpu.data import MultiDomainDataset, TrainLoader

        rng = np.random.default_rng(0)
        (tmp_path / "src").mkdir()
        for i in range(4):
            Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)).save(
                tmp_path / "src" / f"{i}.jpg")
        (tmp_path / "ref" / "D").mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)).save(
                tmp_path / "ref" / "D" / f"{i}.jpg")
        ds = MultiDomainDataset.build(str(tmp_path / "src"), str(tmp_path / "ref"))
        loader = TrainLoader(ds, batch_size=2, image_size=16, second_target=True,
                             num_threads=1)
        b = next(iter(loader.epoch(0)))
        assert b["target2"].shape == (2, 16, 16, 3)


class TestR1:
    def test_penalty_positive_and_finite(self):
        disc = MultiDomainDiscriminator(num_domains=2)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        idx = jnp.zeros((2,), jnp.int32)
        params = disc.init(jax.random.PRNGKey(1), x, idx)
        p = float(r1_penalty(disc.apply, params, x, idx))
        assert np.isfinite(p) and p > 0

    @pytest.mark.heavy
    def test_r1_changes_d_loss_only(self):
        from msig_tpu.config import TrainConfig
        from msig_tpu.losses import init_vgg_params
        from msig_tpu.train import (
            Models, create_train_state, current_loss_weights, make_optimizers,
            make_train_step, weights_vector,
        )

        cfg = TrainConfig(image_size=32, batch_size=2, style_dim=16,
                          n_residual_blocks=1, use_pallas=False)
        models = Models.from_config(cfg, num_domains=2)
        state = create_train_state(cfg, models, jax.random.PRNGKey(0))
        vgg = init_vgg_params()
        tx_g, tx_d = make_optimizers(cfg)
        rng = np.random.default_rng(0)
        batch = {
            "source": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)),
            "target": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)),
            "source_domain": jnp.zeros((2,), jnp.int32),
            "target_domain": jnp.ones((2,), jnp.int32),
        }
        w = jnp.asarray(weights_vector(current_loss_weights(cfg.loss_weights, 0)), jnp.float32)
        args = (jnp.float32(0.0), jnp.float32(0.0), w)

        base = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta))
        with_r1 = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta, r1_gamma=10.0))
        _, m0 = base(state, batch, vgg, *args)
        _, m1 = with_r1(state, batch, vgg, *args)
        assert float(m1["D_loss"]) > float(m0["D_loss"])  # penalty adds
        np.testing.assert_allclose(float(m0["G_loss"]), float(m1["G_loss"]), rtol=1e-5)
