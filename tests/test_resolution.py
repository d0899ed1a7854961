"""Resolution polymorphism: 512x512 (and other sizes) shape-check via eval_shape.

BASELINE config 5 targets 512x512; the networks are fully convolutional with
adaptive pooling so any H=W divisible by 4 works. eval_shape traces without
allocating, so 512^2 is testable on CPU.
"""

import pytest

import jax
import jax.numpy as jnp

from msig_tpu.models import (
    MultiDomainDiscriminator,
    MultiDomainStyleEncoder,
    StyleCycleGANGenerator,
)


def _shapes(mod, *args):
    params = jax.eval_shape(lambda: mod.init(jax.random.PRNGKey(0), *args))
    out = jax.eval_shape(lambda p: mod.apply(p, *args), params)
    return out


@pytest.mark.parametrize("size", [256, 512, 1024])
class TestResolutions:
    def test_generator(self, size):
        gen = StyleCycleGANGenerator(style_dim=256, n_residual_blocks=8)
        img = jnp.zeros((2, size, size, 3))
        out = _shapes(gen, img, jnp.zeros((2, 256)))
        assert out.shape == (2, size, size, 3)

    def test_discriminator_patch_map(self, size):
        disc = MultiDomainDiscriminator(num_domains=10)
        out = _shapes(disc, jnp.zeros((2, size, size, 3)), jnp.zeros((2,), jnp.int32))
        assert out.shape == (2, size // 16, size // 16, 1)

    def test_style_encoder(self, size):
        se = MultiDomainStyleEncoder(style_dim=256, num_domains=10)
        out = _shapes(se, jnp.zeros((2, size, size, 3)), jnp.zeros((2,), jnp.int32))
        assert out.shape == (2, 256)


class TestRematStep:
    @pytest.mark.heavy
    def test_remat_step_runs_and_matches(self):
        """remat=True computes the same losses as remat=False (tiny shapes)."""
        import numpy as np

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
        args = (jnp.float32(2e-4), jnp.float32(1e-4), w)
        base = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta))
        rem = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta, remat=True))
        _, m0 = base(state, batch, vgg, *args)
        _, m1 = rem(state, batch, vgg, *args)
        for k in m0:
            np.testing.assert_allclose(float(m0[k]), float(m1[k]), rtol=1e-4,
                                       atol=1e-6, err_msg=k)
