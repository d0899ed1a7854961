"""GAN / cycle / identity criteria.

LSGAN uses MSE against all-ones / all-zeros patch maps; cycle and identity
are plain L1 — matching the criteria built inline by the reference trainer
(/root/reference/trainer.py:50-52,85-86,99-117). Targets are constants, so
``mean((pred-1)^2)`` / ``mean(pred^2)`` replace materialized label maps
(the reference even runs a throwaway discriminator forward just to size
them, trainer.py:85 — unnecessary under static shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lsgan_real(pred: jax.Array) -> jax.Array:
    """MSE(pred, ones)."""
    p = pred.astype(jnp.float32)
    return jnp.mean(jnp.square(p - 1.0))


def lsgan_fake(pred: jax.Array) -> jax.Array:
    """MSE(pred, zeros)."""
    p = pred.astype(jnp.float32)
    return jnp.mean(jnp.square(p))


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
