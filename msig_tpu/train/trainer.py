"""The training runtime: epoch loop, logging, grids, checkpoints.

Orchestrates the fused jit step over the data pipeline with the same
observable behavior as the reference loop
(/root/reference/trainer.py:276-360):

  - shuffled batches, ``drop_last`` (trainer.py:287-290);
  - per-step loss logging + optional wandb with the same key names
    (``loss/*``, ``avg_loss/*``, ``lr/generator``, ``lr/discriminator``,
    ``weight/*``; trainer.py:308-346);
  - an EMA 2x2 sample grid [Real A, Fake B, Real B, Fake A] every
    ``save_freq`` batches (trainer.py:313-332);
  - per-epoch loss averages into ``loss_history``, loss/weight plots,
    checkpoints every 10 epochs and at the end (trainer.py:334-358);
  - the dynamic weight scheduler is evaluated per step with the epoch index
    (trainer.py:122) so its histories are per-step, like the reference's.

TPU-specific: metrics stay on device during the epoch (no per-step ``.item()``
sync — the reference does 7+ of them, trainer.py:305-311, stalling the
pipeline); they are fetched in one transfer at epoch end unless per-step
wandb logging is enabled.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from msig_tpu.config import TrainConfig
from msig_tpu.data import MultiDomainDataset, TrainLoader
from msig_tpu.losses import get_vgg_params
from msig_tpu.parallel import jit_train_step, replicate, shard_batch
from msig_tpu.parallel.mesh import data_mesh_for_batch
from msig_tpu.train.checkpoint import resume_for_training, save_checkpoint
from msig_tpu.train.schedule import (
    WEIGHT_KEYS,
    cosine_lr,
    current_loss_weights,
    weights_vector,
)
from msig_tpu.train.state import Models, TrainState, create_train_state, make_optimizers
from msig_tpu.train.step import make_train_step, prepare_images
from msig_tpu.utils import plot_losses, plot_weight_history, save_sample_grid

logger = logging.getLogger(__name__)


def _skip_epoch_art() -> bool:
    """MSIG_SKIP_EPOCH_ART=1: skip the per-epoch sample grid + loss/weight
    plots. On a degraded tunneled link the grid's device fetch costs
    seconds per epoch; loss history still accumulates (and checkpoints),
    so the plots can be regenerated afterwards."""
    return os.environ.get("MSIG_SKIP_EPOCH_ART", "0") == "1"

METRIC_KEYS = ["D_loss", "G_loss"] + WEIGHT_KEYS


class Trainer:
    """Owns state + compiled step + pipeline; replaces the reference's
    ``MultiDomainStyleCycleGAN`` + ``train_multi_domain_style_cyclegan`` pair."""

    def __init__(
        self,
        cfg: TrainConfig,
        dataset: MultiDomainDataset,
        wandb_run=None,
    ):
        self.cfg = cfg
        self.dataset = dataset
        self.wandb = wandb_run
        self.num_domains = dataset.num_domains

        dtype = jnp.dtype(cfg.compute_dtype)
        self.models = Models.from_config(cfg, self.num_domains, dtype=dtype)
        self.state = create_train_state(cfg, self.models, jax.random.PRNGKey(cfg.seed))
        self.vgg_params = get_vgg_params(cfg.vgg_weights_path)

        self.mesh = data_mesh_for_batch(cfg.batch_size) if cfg.data_parallel else None
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)
            self.vgg_params = replicate(self.mesh, self.vgg_params)
        tx_g, tx_d = make_optimizers(cfg)
        n_dev = len(self.mesh.devices.ravel()) if self.mesh is not None else 1
        self.train_step = jit_train_step(
            make_train_step(
                self.models, tx_g, tx_d, cfg.ema_beta, dtype,
                r1_gamma=getattr(cfg, "r1_gamma", 0.0),
                remat=getattr(cfg, "remat", False),
                style_recon_weight=getattr(cfg, "style_recon_weight", 0.0),
                diversity_weight=getattr(cfg, "diversity_weight", 0.0),
                n_devices=n_dev,
            ),
            self.mesh,
        )
        # wandb.watch parity (reference trainer.py:294, log_freq=50):
        # a second step variant that also returns on-device per-tensor
        # gradient histograms (train/watch.py), used every watch_freq-th
        # step. Only built when wandb logging is live, same as the
        # reference's `if cfg.wandb: wandb.watch(...)`.
        self.watch_freq = int(getattr(cfg, "watch_freq", 0))
        self.train_step_watch = None
        if self.watch_freq > 0 and wandb_run is not None:
            self.train_step_watch = jit_train_step(
                make_train_step(
                    self.models, tx_g, tx_d, cfg.ema_beta, dtype,
                    r1_gamma=getattr(cfg, "r1_gamma", 0.0),
                    remat=getattr(cfg, "remat", False),
                    style_recon_weight=getattr(cfg, "style_recon_weight", 0.0),
                    diversity_weight=getattr(cfg, "diversity_weight", 0.0),
                    grad_hists=64,
                    n_devices=n_dev,
                ),
                self.mesh,
            )
        self._eval_fn = jax.jit(self._make_eval_fn())

        self.loader = TrainLoader(
            dataset,
            cfg.batch_size,
            cfg.image_size,
            seed=cfg.seed,
            device_put=(lambda b: shard_batch(self.mesh, b)) if self.mesh else None,
            second_target=getattr(cfg, "diversity_weight", 0.0) > 0.0,
        )
        # Device-resident dataset mode: decode once, keep the whole dataset
        # in HBM, augment on device; per-step host traffic is a few hundred
        # bytes of indices/crop params. Big win when host->device bandwidth
        # (or a tunneled runtime) bottlenecks the step (data/device_data.py).
        self.device_data = None
        if getattr(cfg, "device_data", False):
            if self.mesh is not None:
                # DeviceData yields single-device committed arrays, but the
                # jitted step compiles with batch-axis shardings over the
                # mesh — on >1 device the first step would error (and each
                # host would build the full global batch). Guard loudly.
                raise ValueError(
                    "--device_data is single-device only: it keeps the decoded "
                    "dataset resident on ONE chip, which conflicts with the "
                    f"{len(self.mesh.devices.ravel())}-device data-parallel mesh. "
                    "Run with --no_data_parallel, or use the host-fed pipeline "
                    "for multi-device training."
                )
            from msig_tpu.data.device_data import DeviceData

            self.device_data = DeviceData(
                dataset, cfg.image_size,
                second_target=getattr(cfg, "diversity_weight", 0.0) > 0.0,
            )

        # Histories (reference trainer.py:71-72, utils.py:107-108)
        self.loss_history: Dict[str, List[float]] = {k: [] for k in METRIC_KEYS}
        self.weight_history: Dict[str, List[float]] = {k: [] for k in WEIGHT_KEYS}
        self.step_time_ms: List[float] = []  # per-epoch avg wall-clock per step

        self.save_dir = os.path.join(cfg.save_dir_base, cfg.experiment_name)
        self.images_dir = os.path.join(self.save_dir, "images")
        self.checkpoints_dir = os.path.join(self.save_dir, "checkpoints")

    # ------------------------------------------------------------------
    def _make_eval_fn(self):
        """EMA 2x2 grid forward (reference trainer.py:219-239)."""
        gen, se = self.models.generator, self.models.style_encoder

        def eval_fn(ema_params, real_A, real_B, y_org, y_trg):
            real_A = prepare_images(real_A)
            real_B = prepare_images(real_B)
            style_A = se.apply(ema_params["SE_A"], real_A, y_org)
            style_B = se.apply(ema_params["SE_B"], real_B, y_trg)
            fake_B = gen.apply(ema_params["G_A2B"], real_A, style_B)
            fake_A = gen.apply(ema_params["G_B2A"], real_B, style_A)
            return jnp.concatenate([real_A, fake_B, real_B, fake_A], axis=0)

        return eval_fn

    def _save_grid(self, batch, epoch: int, batch_idx: int) -> None:
        first = {k: np.asarray(jax.device_get(v))[0:1] for k, v in batch.items()}
        real_A = prepare_images(jnp.asarray(first["source"]))
        real_B = prepare_images(jnp.asarray(first["target"]))
        # Pass the DEVICE-resident EMA tree straight into the jitted eval fn
        # (it does not donate); a device_get here would download + re-upload
        # ~100 MB of parameters per grid — tens of seconds on tunneled links.
        grid = self._eval_fn(
            self.state.ema_params,
            real_A,
            real_B,
            jnp.asarray(first["source_domain"]),
            jnp.asarray(first["target_domain"]),
        )
        target_idx = int(first["target_domain"][0])
        domains = self.dataset.domains
        domain_name = domains[target_idx] if target_idx < len(domains) else f"Domain_{target_idx}"
        labels = [
            f"Real A ({domains[0]})",
            f"Fake B ({domain_name})",
            f"Real B ({domain_name})",
            f"Fake A ({domains[0]})",
        ]
        path = os.path.join(
            self.images_dir, f"epoch_{epoch + 1:03d}_batch_{batch_idx:04d}_{domain_name}.png"
        )
        save_sample_grid(np.asarray(grid), path, nrow=2, domain_names=labels)

    # ------------------------------------------------------------------
    def resume(self, checkpoint_dir: str) -> int:
        """Restore full state; returns start epoch (0 when unavailable)."""
        self.state, loss_history, start_epoch = resume_for_training(
            checkpoint_dir, self.state, self.num_domains
        )
        if loss_history:
            for k, v in loss_history.items():
                if k in self.loss_history:
                    self.loss_history[k] = list(v)
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)
        return start_epoch

    def save(self, checkpoint_dir: str) -> None:
        meta = {
            "num_domains": self.num_domains,
            "domains": self.dataset.domains,
            "loss_history": self.loss_history,
            "image_size": self.cfg.image_size,
            "style_dim": self.cfg.style_dim,
            "n_residual_blocks": self.cfg.n_residual_blocks,
            "step": int(jax.device_get(self.state.step)),
        }
        save_checkpoint(checkpoint_dir, self.state, meta)

    def save_ema_snapshot(self, snapshot_dir: str) -> None:
        """Portable fp16 EMA (G_A2B + SE_B) export — demo-npz layout.

        Same format as tools/export_demo_checkpoint.py, loadable by the
        inference CLI (msig_tpu/infer/loading.py layout 3). The fp16 cast
        happens ON DEVICE so the host fetch is ~34 MB, not the ~130 MB
        fp32 tree — the difference between 17 s and 65 s per snapshot on
        a ~2 MB/s tunneled link.
        """
        import numpy as np

        if not hasattr(self, "_ema_cast_fn"):
            self._ema_cast_fn = jax.jit(
                lambda t: jax.tree.map(lambda x: x.astype(jnp.float16), t)
            )
        ema = self.state.ema_params
        small = self._ema_cast_fn({"gen": ema["G_A2B"], "se": ema["SE_B"]})
        host = jax.device_get(small)
        flat: Dict[str, np.ndarray] = {}

        def _flatten(tree, prefix):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    _flatten(v, f"{prefix}/{k}")
            else:
                flat[prefix] = np.asarray(tree)

        _flatten(host["gen"], "gen")
        _flatten(host["se"], "se")
        os.makedirs(snapshot_dir, exist_ok=True)
        np.savez(os.path.join(snapshot_dir, "ema_g_se_fp16.npz"), **flat)
        meta = {
            "ema": True,
            "num_domains": self.num_domains,
            "epochs": len(self.loss_history.get("G_loss", [])),
            "note": "in-training fp16 EMA snapshot",
            "style_dim": self.cfg.style_dim,
            "n_residual_blocks": self.cfg.n_residual_blocks,
            "image_size": self.cfg.image_size,
        }
        import json

        with open(os.path.join(snapshot_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)

    # ------------------------------------------------------------------
    def profile_steps(self, n_steps: int = 5, trace_dir: Optional[str] = None) -> str:
        """Trace ``n_steps`` training steps with jax.profiler; returns the dir.

        The reference has no profiling surface at all (SURVEY.md §5); this is
        the TPU-build observability hook — view with TensorBoard or xprof.
        """
        trace_dir = trace_dir or os.path.join(self.save_dir, "profile")
        os.makedirs(trace_dir, exist_ok=True)
        it = self.loader.epoch(0)
        weights = current_loss_weights(self.cfg.loss_weights, 0)
        w_vec = jnp.asarray(weights_vector(weights), jnp.float32)
        g_lr, d_lr = jnp.float32(self.cfg.lr_g), jnp.float32(self.cfg.lr_d)
        # compile outside the trace
        batch = next(it)
        self.state, m = self.train_step(self.state, batch, self.vgg_params, g_lr, d_lr, w_vec)
        jax.block_until_ready(m)
        with jax.profiler.trace(trace_dir):
            for _ in range(n_steps):
                try:
                    batch = next(it)
                except StopIteration:
                    break
                self.state, m = self.train_step(
                    self.state, batch, self.vgg_params, g_lr, d_lr, w_vec
                )
            jax.block_until_ready(m)
        logger.info("Wrote profiler trace to %s", trace_dir)
        return trace_dir

    def train(self, start_epoch: int = 0) -> None:
        cfg = self.cfg
        os.makedirs(self.images_dir, exist_ok=True)
        os.makedirs(self.checkpoints_dir, exist_ok=True)
        steps = self.loader.steps_per_epoch()
        logger.info(
            "Training %d epochs x %d steps, batch %d, %d domains, devices=%d",
            cfg.epochs, steps, cfg.batch_size, self.num_domains, len(jax.devices()),
        )

        for epoch in range(start_epoch, cfg.epochs):
            g_lr = jnp.float32(cosine_lr(cfg.lr_g, epoch, cfg.epochs, cfg.lr_eta_min))
            d_lr = jnp.float32(cosine_lr(cfg.lr_d, epoch, cfg.epochs, cfg.lr_eta_min))
            weights = current_loss_weights(
                cfg.loss_weights, epoch, cfg.warmup_epochs, cfg.decay_epochs
            )
            w_vec = jnp.asarray(weights_vector(weights), jnp.float32)

            epoch_metrics: List[Dict] = []
            t0 = time.time()
            if self.device_data is not None:
                batches = self.device_data.epoch(epoch, cfg.batch_size, seed=cfg.seed)
            else:
                batches = self.loader.epoch(epoch)
            try:  # tqdm progress like the reference (trainer.py:300); optional
                from tqdm import tqdm

                batches = tqdm(batches, total=steps,
                               desc=f"Epoch {epoch + 1}/{cfg.epochs}", leave=False)
            except ImportError:
                pass
            for i, batch in enumerate(batches):
                watching = (
                    self.train_step_watch is not None
                    and (epoch * steps + i) % self.watch_freq == 0
                )
                step_fn = self.train_step_watch if watching else self.train_step
                self.state, metrics = step_fn(
                    self.state, batch, self.vgg_params, g_lr, d_lr, w_vec
                )
                hists = (
                    jax.device_get(metrics.pop("_grad_hists")) if watching else None
                )
                epoch_metrics.append(metrics)
                # weight history is per-step, like the reference (trainer.py:122)
                for k in WEIGHT_KEYS:
                    self.weight_history[k].append(weights[k])
                if self.wandb is not None:
                    vals = jax.device_get(metrics)
                    logs = {f"loss/{k}": float(v) for k, v in vals.items()}
                    if hists is not None:
                        # Same wandb.log call as the step's losses so the
                        # histograms share the step axis (wandb.watch attaches
                        # to the same log step; a separate log() call would
                        # shift every later metric by one step).
                        from msig_tpu.train.watch import to_wandb

                        logs.update(to_wandb(hists))
                    self.wandb.log(logs)
                if i % cfg.save_freq == 0 and not _skip_epoch_art():
                    self._save_grid(batch, epoch, i)

            # One device->host transfer for the whole epoch's metrics
            host = jax.device_get(epoch_metrics)
            avg = {k: float(np.mean([m[k] for m in host])) for k in METRIC_KEYS} if host else {}
            for k, v in avg.items():
                self.loss_history[k].append(v)
            dt = time.time() - t0
            ms_per_step = 1000 * dt / max(1, steps)
            self.step_time_ms.append(ms_per_step)
            logger.info(
                "epoch %d/%d  %.1fs (%.1f ms/step)  %s",
                epoch + 1, cfg.epochs, dt, ms_per_step,
                "  ".join(f"{k}={v:.3f}" for k, v in avg.items()),
            )

            if self.wandb is not None:
                logs = {"epoch": epoch + 1, "perf/step_time_ms": ms_per_step}
                logs.update({f"avg_loss/{k}": v for k, v in avg.items()})
                logs["lr/generator"] = float(g_lr)
                logs["lr/discriminator"] = float(d_lr)
                logs.update({f"weight/{k}": weights[k] for k in WEIGHT_KEYS})
                self.wandb.log(logs)

            if not _skip_epoch_art():
                plot_losses(self.loss_history, os.path.join(self.save_dir, "losses.png"))
                plot_weight_history(
                    self.weight_history,
                    os.path.join(self.save_dir, "weight_history.png"),
                )

            if (epoch + 1) % cfg.checkpoint_every == 0 or (epoch + 1) == cfg.epochs:
                self.save(os.path.join(self.checkpoints_dir, f"epoch_{epoch + 1}"))
            snap_every = getattr(cfg, "ema_snapshot_every", 0)
            if snap_every and (
                (epoch + 1) % snap_every == 0 or (epoch + 1) == cfg.epochs
            ):
                self.save_ema_snapshot(
                    os.path.join(self.save_dir, "ema_snapshots", f"epoch_{epoch + 1}")
                )

        logger.info("Multi-domain training completed!")
