"""Resolve inference weights from either checkpoint format.

Accepts a checkpoint directory in either of two layouts:

  1. msig_tpu native (``state/`` Orbax pytree + ``meta.json``) — EMA weights
     preferred, raw fallback (see msig_tpu/train/checkpoint.py);
  2. reference torch format (``checkpoint.pth`` [+ ``ema_checkpoint.pth``])
     — converted on the fly via :mod:`msig_tpu.compat.torch_import`, with
     the same EMA preference (reference inference.py:46-72);
  3. portable demo export (``ema_g_se_fp16.npz`` + ``meta.json``) — a
     float16 EMA (G_A2B + SE_B) snapshot produced by
     ``tools/export_demo_checkpoint.py``; small enough to version-control,
     so a repo checkout can run inference without retraining.

Returns (G_A2B params, SE_B params, meta, used_ema).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax

from msig_tpu.config import InferenceConfig, TrainConfig


DEMO_NPZ = "ema_g_se_fp16.npz"


def load_inference_params(
    checkpoint_dir: str, cfg: InferenceConfig, num_domains: int
) -> Tuple[Dict, Dict, Dict[str, Any], bool]:
    # Priority: a full native checkpoint (meta.json + Orbax state/) beats a
    # portable fp16 demo npz living in the same directory — the demo export
    # is a lossy derivative and must never silently shadow the full weights.
    import logging

    logger = logging.getLogger(__name__)
    if os.path.exists(os.path.join(checkpoint_dir, "meta.json")) and os.path.isdir(
        os.path.join(checkpoint_dir, "state")
    ):
        logger.info("Loading native (Orbax) checkpoint from %s", checkpoint_dir)
        return _load_native(checkpoint_dir, cfg, num_domains)
    if os.path.exists(os.path.join(checkpoint_dir, DEMO_NPZ)):
        logger.info("Loading fp16 demo checkpoint (%s) from %s", DEMO_NPZ, checkpoint_dir)
        return _load_npz(checkpoint_dir, num_domains)
    if os.path.exists(os.path.join(checkpoint_dir, "checkpoint.pth")):
        logger.info("Loading reference torch checkpoint from %s", checkpoint_dir)
        return _load_torch(checkpoint_dir, cfg, num_domains)
    raise FileNotFoundError(
        f"No msig_tpu (meta.json + state/), reference (checkpoint.pth), or demo "
        f"({DEMO_NPZ}) checkpoint in {checkpoint_dir}"
    )


def _load_npz(checkpoint_dir, num_domains):
    """Demo layout: '/'-joined flat keys ('gen/params/...', 'se/params/...')."""
    import json

    import numpy as np

    flat = np.load(os.path.join(checkpoint_dir, DEMO_NPZ))
    trees: Dict[str, Dict] = {"gen": {}, "se": {}}
    for key in flat.files:
        parts = key.split("/")
        node = trees[parts[0]]
        for p in parts[1:-1]:
            node = node.setdefault(p, {})
        # fp16 is a storage format only; inference casts to compute dtype.
        node[parts[-1]] = flat[key].astype(np.float32)
    meta_path = os.path.join(checkpoint_dir, "meta.json")
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    saved = meta.get("num_domains")
    if saved is not None and int(saved) != num_domains:
        raise ValueError(
            f"Demo checkpoint was trained with {saved} domains but the "
            f"reference directory implies {num_domains} "
            "(same num_domains guard as the native format)"
        )
    return trees["gen"], trees["se"], meta, bool(meta.get("ema", True))


def _load_native(checkpoint_dir, cfg, num_domains):
    from msig_tpu.train.checkpoint import load_meta, load_for_inference
    from msig_tpu.train.state import Models, create_train_state

    meta = load_meta(checkpoint_dir) or {}
    saved_domains = int(meta.get("num_domains", num_domains))
    tcfg = TrainConfig(
        image_size=int(meta.get("image_size", cfg.image_size)),
        style_dim=int(meta.get("style_dim", cfg.style_dim)),
        n_residual_blocks=int(meta.get("n_residual_blocks", cfg.n_residual_blocks)),
    )
    models = Models.from_config(tcfg, saved_domains)
    template = create_train_state(tcfg, models, jax.random.PRNGKey(0))
    gen, se_b, used_ema, meta = load_for_inference(checkpoint_dir, template, use_ema=True)
    return gen, se_b, meta, used_ema


def _load_torch(checkpoint_dir, cfg, num_domains):
    from msig_tpu.compat.torch_import import load_torch_checkpoint_dir

    gen_params, _, ema_params = load_torch_checkpoint_dir(
        checkpoint_dir, num_domains, cfg.style_dim, cfg.n_residual_blocks
    )
    meta = {
        "num_domains": num_domains,
        "style_dim": cfg.style_dim,
        "n_residual_blocks": cfg.n_residual_blocks,
    }
    if ema_params is not None:
        return ema_params["G_A2B"], ema_params["SE_B"], meta, True
    return gen_params["G_A2B"], gen_params["SE_B"], meta, False
