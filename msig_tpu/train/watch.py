"""wandb.watch-equivalent gradient histograms, TPU-style.

The reference calls ``wandb.watch(models=(G_A2B, G_B2A, SE_A, SE_B, D_A,
D_B), log_freq=50)`` (/root/reference/trainer.py:294), which hooks torch
autograd and logs a per-parameter GRADIENT histogram every 50 optimizer
steps (wandb's default ``log="gradients"``).

Shipping every gradient tensor to the host for binning would be the
torch translation — and over this container's ~2 MB/s tunneled link it
would stall training for tens of seconds per watch step. The TPU-native
design bins ON DEVICE inside the already-compiled train step: each
gradient leaf reduces to ``bins`` int32 counts plus its (lo, hi) range,
so a watch step transfers a few KB instead of the full ~50 MB gradient
set. ``wandb.Histogram(np_histogram=...)`` accepts precomputed counts,
so the dashboard rendering is identical to torch's wandb.watch.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_BINS = 64  # wandb.Histogram's own default bin count


def _leaf_histogram(g: jax.Array, bins: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(counts[bins] int32, lo, hi) for one gradient tensor, on device.

    Bin edges span the tensor's own [min, max] like np.histogram's
    auto-range (what wandb.watch produces). Degenerate all-equal tensors
    get the np.histogram convention of a +-0.5 range around the value.
    Non-finite gradients (a diverging run — the exact case watch exists
    for) must not poison the edges: NaN/Inf values are excluded from both
    the range and the counts, matching wandb's own flatten-and-drop
    behavior; an all-non-finite tensor yields zero counts around 0.
    """
    x = g.astype(jnp.float32).ravel()
    finite = jnp.isfinite(x)
    any_finite = jnp.any(finite)
    lo = jnp.where(any_finite, jnp.min(jnp.where(finite, x, jnp.inf)), 0.0)
    hi = jnp.where(any_finite, jnp.max(jnp.where(finite, x, -jnp.inf)), 0.0)
    degenerate = hi <= lo
    lo_ = jnp.where(degenerate, lo - 0.5, lo)
    hi_ = jnp.where(degenerate, hi + 0.5, hi)
    # np.histogram semantics: values == hi land in the LAST bin.
    xf = jnp.where(finite, x, lo_)
    idx = jnp.clip(
        ((xf - lo_) * (bins / (hi_ - lo_))).astype(jnp.int32), 0, bins - 1
    )
    counts = jnp.zeros((bins,), jnp.int32).at[idx].add(
        finite.astype(jnp.int32))
    return counts, lo_, hi_


def _named_leaves(tree: Any, prefix: str) -> Dict[str, jax.Array]:
    """Flatten a flax param tree to {'prefix/G_A2B.params.conv.kernel': leaf}."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = ".".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        out[f"{prefix}/{name}"] = leaf
    return out


def gradient_histograms(
    g_grads: Any, d_grads: Any, bins: int = DEFAULT_BINS
) -> Dict[str, Tuple[jax.Array, jax.Array, jax.Array]]:
    """Per-tensor on-device histograms of both gradient trees.

    Keys follow wandb.watch's ``gradients/<module>.<param>`` convention.
    Call inside the jitted train step; the result is a small pytree of
    [bins] int32 counts + scalar ranges.
    """
    named = _named_leaves(g_grads, "gradients")
    named.update(_named_leaves(d_grads, "gradients"))
    return {k: _leaf_histogram(v, bins) for k, v in named.items()}


def to_wandb(host_hists: Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray]]):
    """Host side: {(counts, lo, hi)} -> {name: wandb.Histogram}.

    Import of wandb is deferred so the module works (and is testable)
    without wandb installed.
    """
    import wandb  # noqa: deferred — only reached when wandb logging is on

    out = {}
    for name, (counts, lo, hi) in host_hists.items():
        edges = np.linspace(float(lo), float(hi), len(counts) + 1)
        out[name] = wandb.Histogram(np_histogram=(np.asarray(counts), edges))
    return out
