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


def gram_matrix(features_nhwc: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Batch-coupled Gram of NHWC features: ``[B*C, B*C]`` in float32.

    The transpose-then-matmul form measures fastest on TPU (an NHWC
    dot_general contracting (H, W) directly avoids a padded temporary but
    costs ~25% step time at batch 32 — measured round 2); its padded
    [B,C,H,W] temporary is only live briefly and the batch<=16 VGG-pair
    path rematerializes features anyway.

    ``dtype`` sets the matmul INPUT precision; accumulation and the result
    are always float32 (``preferred_element_type``). The Gram matmuls are
    ~11 TFLOP/step of the b32 train step (5.5 forward + 5.5 backward), and
    fp32 runs at 1/4 the MXU's bf16 rate on v5e — ``dtype=bfloat16`` keeps
    fp32 accumulation (K = H*W up to 65k terms) while quadrupling matmul
    rate; only the 8-bit input mantissa rounding differs (~0.1% on the
    style loss, measured in tools/profile_train_budget.py).
    """
    b, h, w, c = features_nhwc.shape
    f = jnp.transpose(features_nhwc, (0, 3, 1, 2)).reshape(b * c, h * w)
    f = f.astype(dtype)
    g = jnp.matmul(f, f.T, preferred_element_type=jnp.float32)
    return g.astype(jnp.float32) / (b * c * h * w)
