"""Mapping network: latent z -> per-domain style code (EXTENSION).

Not part of the reference (its style codes come only from the image
encoder, reference model.py:61-118). Provided for latent-guided synthesis:
a shared MLP trunk on z with per-domain output heads, the same
compute-all-heads-then-gather pattern as the other multi-domain modules.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from msig_tpu.models.layers import TorchDense


class MappingNetwork(nn.Module):
    latent_dim: int = 16
    style_dim: int = 256
    num_domains: int = 2
    hidden_dim: int = 512
    num_layers: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z: jax.Array, domain_idx: Optional[jax.Array] = None) -> jax.Array:
        h = z
        for i in range(self.num_layers):
            h = TorchDense(self.hidden_dim, dtype=self.dtype, name=f"fc{i}")(h)
            h = nn.relu(h)
        all_styles = TorchDense(
            self.num_domains * self.style_dim, dtype=self.dtype, name="heads"
        )(h).reshape(-1, self.num_domains, self.style_dim)
        if domain_idx is None:
            return all_styles[:, 0, :]
        idx = domain_idx.reshape(-1, 1, 1).astype(jnp.int32)
        return jnp.take_along_axis(
            all_styles,
            jnp.broadcast_to(idx, (all_styles.shape[0], 1, self.style_dim)),
            axis=1,
        )[:, 0, :]
