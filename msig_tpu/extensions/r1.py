"""R1 gradient penalty (EXTENSION — the reference uses plain LSGAN only).

``R1 = gamma/2 * E[ |∇_x D(x)|^2 ]`` on real images. Enable with
``TrainConfig.r1_gamma > 0``; at 0 (default) the train step is exactly the
reference's loss surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def r1_penalty(disc_apply, disc_params, real: jax.Array, domain_idx: jax.Array) -> jax.Array:
    """gamma-free penalty term E_b[ sum |grad_x D(x)|^2 ] (caller scales)."""

    def score(x):
        return jnp.sum(disc_apply(disc_params, x, domain_idx).astype(jnp.float32))

    grads = jax.grad(score)(real.astype(jnp.float32))
    return jnp.mean(jnp.sum(jnp.square(grads), axis=(1, 2, 3)))
