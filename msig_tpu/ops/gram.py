"""Gram matrices for the VGG style loss — one MXU matmul.

The reference flattens the *batch axis into the rows* of the feature matrix
(/root/reference/losses.py:70-78): for NCHW features it forms
``F = reshape(x, [B*C, H*W])`` and returns ``F @ F.T / (B*C*H*W)`` — a
``[B*C, B*C]`` Gram that couples samples within a batch (its style loss is
batch-size-dependent). That exact semantics is replicated here, as a single
``jnp.matmul`` in float32 so it lands on the MXU with full precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gram_matrix(features_nhwc: jax.Array) -> jax.Array:
    """Batch-coupled Gram of NHWC features: ``[B*C, B*C]`` in float32.

    The transpose-then-matmul form measures fastest on TPU (an NHWC
    dot_general contracting (H, W) directly avoids a padded temporary but
    costs ~25% step time at batch 32 — measured round 2); its padded
    [B,C,H,W] temporary is only live briefly and the batch<=16 VGG-pair
    path rematerializes features anyway.
    """
    b, h, w, c = features_nhwc.shape
    f = jnp.transpose(features_nhwc, (0, 3, 1, 2)).reshape(b * c, h * w)
    f = f.astype(jnp.float32)
    return jnp.matmul(f, f.T, preferred_element_type=jnp.float32) / (b * c * h * w)
