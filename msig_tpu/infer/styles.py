"""Style-sampling modes as pure functions of (style bank, PRNG key).

Parity with the reference's ``apply_style_mode`` (/root/reference/
inference.py:132-169), but vectorized: one call draws a whole batch of
style codes so the generation loop stays batched. Distributional parity:

  - ``average``:     mean of all bank vectors (deterministic);
  - ``random``:      uniform pick per output image;
  - ``interpolate``: two *distinct* uniform picks + alpha ~ U(0,1) per image
                     (random.sample semantics; falls back to vector 0 when
                     the bank has fewer than 2 styles, inference.py:149-150);
  - ``noise``:       uniform pick + N(0, noise_level^2) perturbation;
  - ``specific``:    always the first vector (deterministic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

STYLE_MODES = ("average", "random", "interpolate", "noise", "specific")
# 'latent' (EXTENSION, not in the reference) additionally requires a mapping
# network; handled by the engine, not by sample_styles.
ALL_STYLE_MODES = STYLE_MODES + ("latent",)


def sample_styles(
    style_bank: jax.Array,  # [N, S]
    mode: str,
    key: jax.Array,
    batch: int,
    noise_level: float = 0.1,
) -> jax.Array:
    """Draw ``batch`` style codes [batch, S] from the bank under ``mode``."""
    n, s = style_bank.shape
    if mode == "average":
        return jnp.broadcast_to(jnp.mean(style_bank, axis=0), (batch, s))
    if mode == "specific":
        return jnp.broadcast_to(style_bank[0], (batch, s))
    if mode == "random":
        idx = jax.random.randint(key, (batch,), 0, n)
        return style_bank[idx]
    if mode == "interpolate":
        if n < 2:
            return jnp.broadcast_to(style_bank[0], (batch, s))
        k1, k2, k3 = jax.random.split(key, 3)
        i = jax.random.randint(k1, (batch,), 0, n)
        # distinct second index: draw from the other n-1 slots
        j = jax.random.randint(k2, (batch,), 0, n - 1)
        j = jnp.where(j >= i, j + 1, j)
        alpha = jax.random.uniform(k3, (batch, 1))
        return alpha * style_bank[i] + (1.0 - alpha) * style_bank[j]
    if mode == "noise":
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (batch,), 0, n)
        noise = jax.random.normal(k2, (batch, s)) * noise_level
        return style_bank[idx] + noise
    raise ValueError(f"Unknown style mode: {mode}")
