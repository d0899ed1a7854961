"""Checkpoint save / load / resume (Orbax + JSON metadata).

Capability parity with the reference's two-pickle scheme
(/root/reference/trainer.py:157-207):

  - one checkpoint directory per save point (``.../checkpoints/epoch_N``)
    holding the FULL train state — all six networks, both optimizer states,
    the four EMA copies and the step counter — as one Orbax pytree, plus a
    ``meta.json`` with ``num_domains``, the domain list, ``loss_history``
    and the epoch;
  - resume restores everything and derives ``start_epoch`` from the length
    of the loss history (trainer.py:206-207);
  - a ``num_domains`` mismatch warns and starts from scratch
    (trainer.py:185-189);
  - inference prefers the EMA generator/style-encoder and falls back to the
    raw ones (inference.py:46-72) — both always live in the same state here,
    so the preference is a field choice, not a file probe.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from msig_tpu.train.state import TrainState

logger = logging.getLogger(__name__)

_STATE_DIR = "state"
_META_FILE = "meta.json"


def save_checkpoint(save_dir: str, state: TrainState, meta: Dict[str, Any]) -> None:
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(save_dir, _STATE_DIR))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    with open(os.path.join(save_dir, _META_FILE), "w") as f:
        json.dump(meta, f)
    logger.info("Saved checkpoint to %s", save_dir)


def load_meta(save_dir: str) -> Optional[Dict[str, Any]]:
    meta_path = os.path.join(save_dir, _META_FILE)
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        return json.load(f)


def restore_checkpoint(save_dir: str, template: TrainState) -> Tuple[Optional[TrainState], Optional[Dict[str, Any]]]:
    """Restore state+meta; (None, None) if absent (start from scratch)."""
    path = os.path.abspath(os.path.join(save_dir, _STATE_DIR))
    meta = load_meta(save_dir)
    if meta is None or not os.path.exists(path):
        logger.warning("Checkpoint not found at %s. Starting from scratch.", save_dir)
        return None, None
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(path, item=jax.device_get(template))
    return state, meta


def _resume_from_torch(
    save_dir: str, template: TrainState, expected_num_domains: int
) -> Tuple[TrainState, Dict[str, Any], int]:
    """Resume from a reference-format torch checkpoint directory.

    Imports all six networks (+ EMA when present) via msig_tpu.compat and
    derives start_epoch from the pickled loss history, mirroring the
    reference's resume semantics (trainer.py:176-207). Optimizer state is
    re-initialized (Adam moments re-warm within a few steps).
    """
    import jax.numpy as jnp
    import torch

    from msig_tpu.compat.torch_import import load_torch_checkpoint_dir

    ckpt = torch.load(
        os.path.join(save_dir, "checkpoint.pth"), map_location="cpu", weights_only=False
    )
    saved_domains = int(ckpt.get("num_domains", 2))
    if saved_domains != expected_num_domains:
        logger.warning(
            "Saved torch model has %d domains, but current model expects %d — "
            "starting from scratch",
            saved_domains,
            expected_num_domains,
        )
        return template, {}, 0
    # infer hyperparams from the template's shapes
    style_dim = template.gen_params["SE_A"]["params"]["branches"]["kernel"].shape[1] // saved_domains
    n_res = sum(
        1 for k in template.gen_params["G_A2B"]["params"] if k.startswith("resblock")
    )
    gen_params, disc_params, ema_params = load_torch_checkpoint_dir(
        save_dir, saved_domains, style_dim, n_res
    )
    as_jnp = lambda tree: jax.tree.map(jnp.asarray, tree)
    state = TrainState(
        gen_params=as_jnp(gen_params),
        disc_params=as_jnp(disc_params),
        ema_params=as_jnp(ema_params if ema_params is not None else gen_params),
        opt_g=template.opt_g,
        opt_d=template.opt_d,
        step=template.step,
    )
    loss_history = {
        k: [float(x) for x in v] for k, v in ckpt.get("loss_history", {}).items()
    }
    start_epoch = len(loss_history.get("G_loss", []))
    logger.info("Imported reference torch checkpoint from %s (epoch %d)", save_dir, start_epoch)
    return state, loss_history, start_epoch


def resume_for_training(
    save_dir: str, template: TrainState, expected_num_domains: int
) -> Tuple[TrainState, Dict[str, Any], int]:
    """(state, loss_history, start_epoch); scratch on missing/domain-mismatch.

    Accepts both native (Orbax) and reference torch checkpoint directories.
    """
    if not os.path.exists(os.path.join(save_dir, _META_FILE)) and os.path.exists(
        os.path.join(save_dir, "checkpoint.pth")
    ):
        return _resume_from_torch(save_dir, template, expected_num_domains)
    state, meta = restore_checkpoint(save_dir, template)
    if state is None:
        return template, {}, 0
    saved_domains = int(meta.get("num_domains", 2))
    if saved_domains != expected_num_domains:
        logger.warning(
            "Saved model has %d domains, but current model expects %d — starting from scratch",
            saved_domains,
            expected_num_domains,
        )
        return template, {}, 0
    loss_history = meta.get("loss_history", {})
    start_epoch = len(loss_history.get("G_loss", []))
    return state, loss_history, start_epoch


def load_for_inference(
    save_dir: str, template: TrainState, use_ema: bool = True
) -> Tuple[Dict[str, Any], Dict[str, Any], bool, Dict[str, Any]]:
    """(G_A2B params, SE_B params, used_ema, meta) for the inference engine.

    EMA weights are preferred (reference inference.py:46-61); ``use_ema=False``
    or an EMA-less checkpoint falls back to the raw training weights.
    """
    state, meta = restore_checkpoint(save_dir, template)
    if state is None:
        raise FileNotFoundError(f"Checkpoint not found: {save_dir}")
    ema_ok = use_ema and state.ema_params is not None
    src = state.ema_params if ema_ok else state.gen_params
    return src["G_A2B"], src["SE_B"], ema_ok, meta or {}
