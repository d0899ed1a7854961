"""End-to-end tiny training run: artifacts, checkpoints, resume (CPU, 8 dev)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax

from msig_tpu.config import TrainConfig
from msig_tpu.data import MultiDomainDataset
from msig_tpu.train.checkpoint import load_for_inference, resume_for_training
from msig_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def tiny_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    src = root / "src"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            src / f"s{i}.jpg"
        )
    ref = root / "ref"
    for d in ("DomA", "DomB"):
        (ref / d).mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(
                ref / d / f"r{i}.jpg"
            )
    return root


@pytest.fixture(scope="module")
def cfg(tiny_tree):
    return TrainConfig(
        source_dir=str(tiny_tree / "src"),
        target_dir=str(tiny_tree / "ref"),
        save_dir_base=str(tiny_tree / "results"),
        exp_name="tiny",
        epochs=2,
        image_size=32,
        batch_size=4,
        save_freq=1,
        style_dim=16,
        n_residual_blocks=1,
        checkpoint_every=1,
        ema_snapshot_every=1,
        use_pallas=False,
        data_parallel=True,  # exercises the 8-device CPU mesh (batch 4... -> padded?)
    )


@pytest.fixture(scope="module")
def trained(cfg, tiny_tree):
    dataset = MultiDomainDataset.build(cfg.source_dir, cfg.target_dir)
    trainer = Trainer(cfg, dataset)
    trainer.train(start_epoch=0)
    return trainer


class TestEndToEnd:
    def test_artifact_tree(self, trained, cfg):
        save_dir = os.path.join(cfg.save_dir_base, "tiny")
        assert os.path.isdir(os.path.join(save_dir, "images"))
        assert os.path.isfile(os.path.join(save_dir, "losses.png"))
        assert os.path.isfile(os.path.join(save_dir, "weight_history.png"))
        grids = os.listdir(os.path.join(save_dir, "images"))
        assert any(g.startswith("epoch_001_batch_0000") for g in grids)
        for e in (1, 2):
            ckpt = os.path.join(save_dir, "checkpoints", f"epoch_{e}")
            assert os.path.isdir(ckpt), ckpt
            with open(os.path.join(ckpt, "meta.json")) as f:
                meta = json.load(f)
            assert meta["num_domains"] == 3
            assert meta["domains"] == ["source", "DomA", "DomB"]

    def test_loss_history_lengths(self, trained):
        assert len(trained.loss_history["G_loss"]) == 2
        assert len(trained.loss_history["D_loss"]) == 2
        assert all(np.isfinite(v) for v in trained.loss_history["G_loss"])
        # 2 epochs x 1 step/epoch (4 imgs / batch 4), per-step weight history
        assert len(trained.weight_history["gan"]) == 2

    def test_resume_restores_state_and_epoch(self, trained, cfg):
        ckpt = os.path.join(cfg.save_dir_base, "tiny", "checkpoints", "epoch_2")
        dataset = MultiDomainDataset.build(cfg.source_dir, cfg.target_dir)
        fresh = Trainer(cfg, dataset)
        start = fresh.resume(ckpt)
        assert start == 2
        # restored params equal trained params bitwise
        a = jax.device_get(trained.state.gen_params["G_A2B"])
        b = jax.device_get(fresh.state.gen_params["G_A2B"])
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_num_domains_guard(self, trained, cfg, tiny_tree):
        """Checkpoint with 3 domains + model expecting 4 -> scratch (epoch 0)."""
        ckpt = os.path.join(cfg.save_dir_base, "tiny", "checkpoints", "epoch_2")
        state, hist, start = resume_for_training(ckpt, trained.state, expected_num_domains=4)
        assert start == 0 and hist == {}

    def test_inference_load_prefers_ema(self, trained, cfg):
        ckpt = os.path.join(cfg.save_dir_base, "tiny", "checkpoints", "epoch_2")
        g, se_b, used_ema, meta = load_for_inference(ckpt, trained.state)
        assert used_ema
        want = jax.device_get(trained.state.ema_params["G_A2B"])
        for x, y in zip(jax.tree.leaves(want), jax.tree.leaves(g)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    @pytest.mark.heavy
    def test_profile_steps_writes_trace(self, trained, tmp_path):
        trace_dir = trained.profile_steps(n_steps=1, trace_dir=str(tmp_path / "prof"))
        assert os.path.isdir(trace_dir)
        # jax.profiler writes a plugins/profile/<ts>/ tree with trace files
        found = [f for _, _, fs in os.walk(trace_dir) for f in fs]
        assert found, "profiler produced no files"

    def test_ema_snapshot_written_and_inference_loadable(self, trained, cfg):
        """ema_snapshot_every: fp16 npz per epoch, loadable as layout 3."""
        from msig_tpu.config import InferenceConfig
        from msig_tpu.infer.loading import load_inference_params

        for e in (1, 2):
            snap = os.path.join(cfg.save_dir_base, "tiny", "ema_snapshots", f"epoch_{e}")
            assert os.path.isfile(os.path.join(snap, "ema_g_se_fp16.npz")), snap
        snap = os.path.join(cfg.save_dir_base, "tiny", "ema_snapshots", "epoch_2")
        icfg = InferenceConfig(style_dim=cfg.style_dim,
                               n_residual_blocks=cfg.n_residual_blocks,
                               image_size=cfg.image_size)
        g, se_b, meta, used_ema = load_inference_params(snap, icfg, num_domains=3)
        assert used_ema and meta["num_domains"] == 3 and meta["epochs"] == 2
        want = jax.device_get(trained.state.ema_params["G_A2B"])
        got_leaves = jax.tree.leaves(g)
        want_leaves = jax.tree.leaves(want)
        assert len(got_leaves) == len(want_leaves)
        for x, y in zip(want_leaves, got_leaves):
            # fp16 storage round-trip: exact to fp16 resolution
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-3
            )

    def test_ema_differs_from_raw_after_training(self, trained):
        raw = jax.tree.leaves(jax.device_get(trained.state.gen_params))[0]
        ema = jax.tree.leaves(jax.device_get(trained.state.ema_params))[0]
        assert np.abs(np.asarray(raw) - np.asarray(ema)).max() > 0
