"""Train state: one pytree holding all six networks + EMA + optimizer states.

The reference trainer owns six live nets, four EMA copies, two Adam
optimizers and two LR schedulers as Python attributes
(/root/reference/trainer.py:25-72). Here all of it is a single immutable
pytree threaded through one jitted step — checkpointable as a unit (Orbax)
and trivially shardable with pjit.

Optimizers: ``clip_by_global_norm(1.0) -> scale_by_adam(0.5, 0.999)``;
the learning rate multiplies the updates inside the step (it arrives as a
scalar input, so the per-epoch cosine schedule never triggers recompiles).
Clipping the raw grads before Adam matches the reference's
``clip_grad_norm_`` before ``optimizer.step()`` (trainer.py:125-128,151-153).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from msig_tpu.config import TrainConfig
from msig_tpu.models import (
    MultiDomainDiscriminator,
    MultiDomainStyleEncoder,
    StyleCycleGANGenerator,
)

Params = Dict[str, Any]


@struct.dataclass
class TrainState:
    gen_params: Params  # {'G_A2B','G_B2A','SE_A','SE_B'}
    disc_params: Params  # {'D_A','D_B'}
    ema_params: Params  # {'G_A2B','G_B2A','SE_A','SE_B'}
    opt_g: Any
    opt_d: Any
    step: jax.Array  # int32 global step counter


@dataclasses.dataclass(frozen=True)
class Models:
    """The three module definitions (hparams static, params external)."""

    generator: StyleCycleGANGenerator
    style_encoder: MultiDomainStyleEncoder
    discriminator: MultiDomainDiscriminator
    num_domains: int

    @staticmethod
    def from_config(
        cfg: TrainConfig, num_domains: int, dtype: Any = None
    ) -> "Models":
        return Models(
            generator=StyleCycleGANGenerator(
                style_dim=cfg.style_dim,
                n_residual_blocks=cfg.n_residual_blocks,
                dtype=dtype,
                use_pallas=cfg.use_pallas,
            ),
            style_encoder=MultiDomainStyleEncoder(
                style_dim=cfg.style_dim, num_domains=num_domains, dtype=dtype
            ),
            discriminator=MultiDomainDiscriminator(num_domains=num_domains, dtype=dtype),
            num_domains=num_domains,
        )


def make_optimizers(cfg: TrainConfig) -> Tuple[optax.GradientTransformation, optax.GradientTransformation]:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2),
    )
    return tx, tx


def create_train_state(cfg: TrainConfig, models: Models, rng: jax.Array) -> TrainState:
    """Initialize the six networks (independent keys) + EMA copies + optimizers."""
    size = cfg.image_size
    img = jnp.zeros((1, size, size, 3), jnp.float32)
    style = jnp.zeros((1, cfg.style_dim), jnp.float32)
    idx = jnp.zeros((1,), jnp.int32)

    keys = jax.random.split(rng, 6)
    gen_params = {
        "G_A2B": models.generator.init(keys[0], img, style),
        "G_B2A": models.generator.init(keys[1], img, style),
        "SE_A": models.style_encoder.init(keys[2], img, idx),
        "SE_B": models.style_encoder.init(keys[3], img, idx),
    }
    disc_params = {
        "D_A": models.discriminator.init(keys[4], img, idx),
        "D_B": models.discriminator.init(keys[5], img, idx),
    }
    # Real buffer copy (aliasing gen_params would break donation: the same
    # buffer would be donated twice in the fused step).
    ema_params = jax.tree.map(jnp.copy, gen_params)

    tx_g, tx_d = make_optimizers(cfg)
    return TrainState(
        gen_params=gen_params,
        disc_params=disc_params,
        ema_params=ema_params,
        opt_g=tx_g.init(gen_params),
        opt_d=tx_d.init(disc_params),
        step=jnp.zeros((), jnp.int32),
    )


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
