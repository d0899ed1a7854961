"""Training-dynamics tests for the fused train step (tiny shapes, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msig_tpu.config import TrainConfig
from msig_tpu.losses import init_vgg_params
from msig_tpu.train import (
    Models,
    create_train_state,
    current_loss_weights,
    make_optimizers,
    make_train_step,
    weights_vector,
)

BATCH, SIZE, SDIM = 2, 32, 16


@pytest.fixture(scope="module")
def setup():
    cfg = TrainConfig(image_size=SIZE, batch_size=BATCH, style_dim=SDIM,
                      n_residual_blocks=1, use_pallas=False)
    models = Models.from_config(cfg, num_domains=3)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    tx_g, tx_d = make_optimizers(cfg)
    step = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta))
    vgg = init_vgg_params()
    rng = np.random.default_rng(0)
    batch = {
        "source": jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32)),
        "target": jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32)),
        "source_domain": jnp.zeros((BATCH,), jnp.int32),
        "target_domain": jnp.asarray([1, 2], jnp.int32),
    }
    w = jnp.asarray(weights_vector(current_loss_weights(cfg.loss_weights, 0)), jnp.float32)
    return cfg, models, state, step, vgg, batch, w


class TestTrainStep:
    def test_one_step_finite_and_advances(self, setup):
        cfg, models, state, step, vgg, batch, w = setup
        new_state, metrics = step(state, batch, vgg, jnp.float32(2e-4), jnp.float32(1e-4), w)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        assert int(new_state.step) == 1
        expected = {"D_loss", "G_loss", "gan", "cycle", "identity", "content", "style",
                    "g_grad_norm", "d_grad_norm"}
        assert set(metrics.keys()) == expected
        assert float(metrics["g_grad_norm"]) > 0
        assert float(metrics["d_grad_norm"]) > 0

    def test_params_change_and_ema_recurrence(self, setup):
        cfg, models, state, step, vgg, batch, w = setup
        new_state, _ = step(state, batch, vgg, jnp.float32(2e-4), jnp.float32(1e-4), w)
        # G and D params both move
        g0 = jax.tree.leaves(state.gen_params)[0]
        g1 = jax.tree.leaves(new_state.gen_params)[0]
        assert np.abs(np.asarray(g1) - np.asarray(g0)).max() > 0
        d0 = jax.tree.leaves(state.disc_params)[0]
        d1 = jax.tree.leaves(new_state.disc_params)[0]
        assert np.abs(np.asarray(d1) - np.asarray(d0)).max() > 0
        # EMA after one step == beta*init + (1-beta)*new  (ema init == gen init)
        want = jax.tree.map(
            lambda e, p: e * cfg.ema_beta + (1 - cfg.ema_beta) * p,
            state.gen_params, new_state.gen_params,
        )
        got_leaf = jax.tree.leaves(new_state.ema_params)[0]
        want_leaf = jax.tree.leaves(want)[0]
        np.testing.assert_allclose(np.asarray(got_leaf), np.asarray(want_leaf), rtol=1e-5, atol=1e-7)

    def test_multiple_steps_stay_finite(self, setup):
        cfg, models, state, step, vgg, batch, w = setup
        s = state
        for _ in range(3):
            s, metrics = step(s, batch, vgg, jnp.float32(2e-4), jnp.float32(1e-4), w)
        assert np.isfinite(float(metrics["G_loss"]))
        assert np.isfinite(float(metrics["D_loss"]))
        assert int(s.step) == 3

    def test_loss_weights_scale_g_loss(self, setup):
        """G_loss with zero weights collapses to 0 — weights actually gate terms."""
        cfg, models, state, step, vgg, batch, _ = setup
        zero_w = jnp.zeros((5,), jnp.float32)
        _, metrics = step(state, batch, vgg, jnp.float32(0.0), jnp.float32(0.0), zero_w)
        np.testing.assert_allclose(float(metrics["G_loss"]), 0.0, atol=1e-6)
        # individual (unweighted) losses still reported non-zero
        assert float(metrics["cycle"]) > 0

    def test_uint8_batch_accepted(self, setup):
        cfg, models, state, step, vgg, batch, w = setup
        rng = np.random.default_rng(1)
        b8 = dict(batch)
        b8["source"] = jnp.asarray(rng.integers(0, 256, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))
        b8["target"] = jnp.asarray(rng.integers(0, 256, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))
        _, metrics = step(state, b8, vgg, jnp.float32(2e-4), jnp.float32(1e-4), w)
        assert np.isfinite(float(metrics["G_loss"]))

    @pytest.mark.heavy
    def test_batch_forwards_matches_unbatched(self, setup):
        """batch_forwards=True (3 G launches + paired D/VGG) must reproduce the
        unbatched structure's metrics AND updated params (ADVICE r2: this
        equivalence was asserted only for the VGG pair loss before)."""
        cfg, models, state, _, vgg, batch, w = setup
        tx_g, tx_d = make_optimizers(cfg)
        step_t = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta,
                                         batch_forwards=True))
        step_f = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta,
                                         batch_forwards=False))
        st_t, m_t = step_t(state, batch, vgg, jnp.float32(2e-4), jnp.float32(1e-4), w)
        st_f, m_f = step_f(state, batch, vgg, jnp.float32(2e-4), jnp.float32(1e-4), w)
        for k in m_f:
            np.testing.assert_allclose(float(m_t[k]), float(m_f[k]),
                                       rtol=2e-4, atol=1e-5, err_msg=k)
        for lt, lf in zip(jax.tree.leaves(st_t.gen_params),
                          jax.tree.leaves(st_f.gen_params)):
            np.testing.assert_allclose(np.asarray(lt), np.asarray(lf),
                                       rtol=2e-3, atol=2e-5)

    @pytest.mark.heavy
    def test_vgg_pair_2x2_matches_unbatched(self, setup):
        """vgg_pair='2x2' (two 2B VGG launches, losses/vgg.py pair2) must
        reproduce the unbatched structure's metrics."""
        cfg, models, state, _, vgg, batch, w = setup
        tx_g, tx_d = make_optimizers(cfg)
        step_t = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta,
                                         vgg_pair="2x2"))
        step_f = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta,
                                         vgg_pair=False))
        _, m_t = step_t(state, batch, vgg, jnp.float32(2e-4), jnp.float32(1e-4), w)
        _, m_f = step_f(state, batch, vgg, jnp.float32(2e-4), jnp.float32(1e-4), w)
        for k in m_f:
            np.testing.assert_allclose(float(m_t[k]), float(m_f[k]),
                                       rtol=2e-4, atol=1e-5, err_msg=k)
