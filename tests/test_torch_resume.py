"""Resume training directly from a reference-format torch checkpoint dir."""

import numpy as np
import pytest
import torch

import jax

from msig_tpu.config import TrainConfig
from msig_tpu.train import Models, create_train_state
from msig_tpu.train.checkpoint import resume_for_training

from tests.test_torch_import import make_disc_sd, make_gen_sd, make_se_sd


@pytest.fixture(scope="module")
def torch_ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tckpt")
    torch.save(
        {
            "G_A2B": make_gen_sd(), "G_B2A": make_gen_sd(),
            "SE_A": make_se_sd(), "SE_B": make_se_sd(),
            "D_A": make_disc_sd(), "D_B": make_disc_sd(),
            "num_domains": 3,
            "loss_history": {"G_loss": [1.0, 0.9, 0.8], "D_loss": [0.5, 0.4, 0.3]},
        },
        d / "checkpoint.pth",
    )
    torch.save(
        {
            "ema_G_A2B": make_gen_sd(), "ema_G_B2A": make_gen_sd(),
            "ema_SE_A": make_se_sd(), "ema_SE_B": make_se_sd(),
        },
        d / "ema_checkpoint.pth",
    )
    return str(d)


@pytest.fixture(scope="module")
def template():
    cfg = TrainConfig(image_size=32, style_dim=16, n_residual_blocks=2, use_pallas=False)
    models = Models.from_config(cfg, num_domains=3)
    return create_train_state(cfg, models, jax.random.PRNGKey(0))


class TestTorchResume:
    def test_resume_restores_epoch_and_params(self, torch_ckpt_dir, template):
        state, hist, start = resume_for_training(torch_ckpt_dir, template, 3)
        assert start == 3
        assert hist["G_loss"] == [1.0, 0.9, 0.8]
        # params actually replaced (template was random-init with other seed)
        a = jax.tree.leaves(template.gen_params["G_A2B"])[0]
        b = jax.tree.leaves(state.gen_params["G_A2B"])[0]
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        # structure matches the template exactly (required for the jit step)
        ta = jax.tree.structure(template.gen_params)
        tb = jax.tree.structure(state.gen_params)
        assert ta == tb
        for x, y in zip(jax.tree.leaves(template.gen_params), jax.tree.leaves(state.gen_params)):
            assert x.shape == y.shape and x.dtype == y.dtype

    def test_domain_mismatch_starts_scratch(self, torch_ckpt_dir, template):
        state, hist, start = resume_for_training(torch_ckpt_dir, template, 5)
        assert start == 0 and hist == {}

    def test_resumed_state_trains(self, torch_ckpt_dir, template):
        """One jitted step runs on the imported state (structural proof)."""
        import jax.numpy as jnp

        from msig_tpu.config import TrainConfig
        from msig_tpu.losses import init_vgg_params
        from msig_tpu.train import (
            Models, current_loss_weights, make_optimizers, make_train_step,
            weights_vector,
        )

        cfg = TrainConfig(image_size=32, batch_size=2, style_dim=16,
                          n_residual_blocks=2, use_pallas=False)
        models = Models.from_config(cfg, num_domains=3)
        state, _, _ = resume_for_training(torch_ckpt_dir, template, 3)
        tx_g, tx_d = make_optimizers(cfg)
        step = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta))
        rng = np.random.default_rng(0)
        batch = {
            "source": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)),
            "target": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)),
            "source_domain": jnp.zeros((2,), jnp.int32),
            "target_domain": jnp.asarray([1, 2], jnp.int32),
        }
        w = jnp.asarray(weights_vector(current_loss_weights(cfg.loss_weights, 0)), jnp.float32)
        new_state, metrics = step(state, batch, init_vgg_params(),
                                  jnp.float32(2e-4), jnp.float32(1e-4), w)
        assert np.isfinite(float(metrics["G_loss"]))
