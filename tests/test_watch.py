"""Gradient-histogram (wandb.watch parity) tests — tiny shapes, CPU.

The reference logs per-tensor gradient histograms via
``wandb.watch(models=(...), log_freq=50)`` (/root/reference/trainer.py:294).
Our equivalent bins gradients ON DEVICE (msig_tpu/train/watch.py) and the
watch-step variant of the fused train step returns them in metrics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msig_tpu.config import TrainConfig
from msig_tpu.losses import init_vgg_params
from msig_tpu.train import (
    Models,
    create_train_state,
    current_loss_weights,
    make_optimizers,
    make_train_step,
    weights_vector,
)
from msig_tpu.train.watch import _leaf_histogram, gradient_histograms

BATCH, SIZE, SDIM = 2, 32, 16


def test_leaf_histogram_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(37, 5)).astype(np.float32)
    counts, lo, hi = jax.jit(lambda g: _leaf_histogram(g, 16))(jnp.asarray(x))
    ref_counts, ref_edges = np.histogram(x, bins=16)
    np.testing.assert_array_equal(np.asarray(counts), ref_counts)
    assert np.isclose(float(lo), ref_edges[0]) and np.isclose(float(hi), ref_edges[-1])
    assert int(np.asarray(counts).sum()) == x.size


def test_leaf_histogram_degenerate_constant():
    counts, lo, hi = _leaf_histogram(jnp.full((8,), 3.0), 4)
    assert int(np.asarray(counts).sum()) == 8
    assert float(lo) < 3.0 < float(hi)


def test_leaf_histogram_nonfinite_excluded():
    """NaN/Inf gradients (a diverging run — the case watch exists for)
    must not poison the bin edges; they are dropped like wandb does."""
    x = jnp.asarray([1.0, np.nan, 2.0, np.inf, 3.0, -np.inf], jnp.float32)
    counts, lo, hi = _leaf_histogram(x, 4)
    assert np.isfinite(float(lo)) and np.isfinite(float(hi))
    assert float(lo) == 1.0 and float(hi) == 3.0
    assert int(np.asarray(counts).sum()) == 3  # only the finite values

    # all-non-finite: zero counts, finite degenerate range (edges buildable)
    counts, lo, hi = _leaf_histogram(jnp.full((5,), np.nan), 4)
    assert np.isfinite(float(lo)) and np.isfinite(float(hi))
    assert float(hi) > float(lo)
    assert int(np.asarray(counts).sum()) == 0
    edges = np.linspace(float(lo), float(hi), 5)
    assert np.all(np.isfinite(edges))


@pytest.fixture(scope="module")
def setup():
    cfg = TrainConfig(image_size=SIZE, batch_size=BATCH, style_dim=SDIM,
                      n_residual_blocks=1, use_pallas=False)
    models = Models.from_config(cfg, num_domains=3)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    tx_g, tx_d = make_optimizers(cfg)
    vgg = init_vgg_params()
    rng = np.random.default_rng(0)
    batch = {
        "source": jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32)),
        "target": jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32)),
        "source_domain": jnp.zeros((BATCH,), jnp.int32),
        "target_domain": jnp.asarray([1, 2], jnp.int32),
    }
    w = jnp.asarray(weights_vector(current_loss_weights(cfg.loss_weights, 0)), jnp.float32)
    return cfg, models, state, tx_g, tx_d, vgg, batch, w


@pytest.mark.heavy
def test_watch_step_matches_plain_step(setup):
    """The grad_hists variant must not change the training math."""
    cfg, models, state, tx_g, tx_d, vgg, batch, w = setup
    lr = jnp.float32(1e-4)
    plain = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta))
    watch = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta, grad_hists=8))
    s1, m1 = plain(state, batch, vgg, lr, lr, w)
    s2, m2 = watch(state, batch, vgg, lr, lr, w)

    hists = m2.pop("_grad_hists")
    assert "_grad_hists" not in m1
    for k in m1:
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=1e-5, atol=1e-6)
    l1 = jax.tree_util.tree_leaves(s1.gen_params)
    l2 = jax.tree_util.tree_leaves(s2.gen_params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    # One histogram per G+D gradient tensor, counts summing to tensor size.
    n_tensors = len(jax.tree_util.tree_leaves(state.gen_params)) + len(
        jax.tree_util.tree_leaves(state.disc_params))
    assert len(hists) == n_tensors
    sizes = {
        f"gradients/{name}": leaf.size
        for tree in (state.gen_params, state.disc_params)
        for name, leaf in _named_items(tree)
    }
    for name, (counts, lo, hi) in hists.items():
        assert counts.shape == (8,)
        assert int(np.asarray(counts).sum()) == sizes[name]
        assert float(hi) > float(lo)
    assert any(k.startswith("gradients/G_A2B") for k in hists)
    assert any(k.startswith("gradients/D_A") for k in hists)


def _named_items(tree):
    from msig_tpu.train.watch import _named_leaves

    return [(k.split("/", 1)[1], v) for k, v in _named_leaves(tree, "x").items()]


@pytest.mark.heavy
def test_trainer_watch_path(tmp_path, monkeypatch):
    """Drive the trainer's watch wiring end-to-end with a stub wandb."""
    import sys
    import types

    from PIL import Image

    from msig_tpu.data import MultiDomainDataset
    from msig_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    (tmp_path / "src").mkdir()
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            tmp_path / "src" / f"s{i}.jpg")
    (tmp_path / "ref" / "DomA").mkdir(parents=True)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            tmp_path / "ref" / "DomA" / f"r{i}.jpg")

    class FakeHistogram:
        def __init__(self, np_histogram=None):
            counts, edges = np_histogram
            assert len(edges) == len(counts) + 1
            self.total = int(np.asarray(counts).sum())

    fake_wandb = types.ModuleType("wandb")
    fake_wandb.Histogram = FakeHistogram
    monkeypatch.setitem(sys.modules, "wandb", fake_wandb)

    logged = []

    class FakeRun:
        def log(self, d):
            logged.append(d)

    cfg = TrainConfig(
        source_dir=str(tmp_path / "src"),
        target_dir=str(tmp_path / "ref"),
        save_dir_base=str(tmp_path / "results"),
        exp_name="watch",
        epochs=1,
        image_size=32,
        batch_size=2,
        save_freq=10,
        style_dim=16,
        n_residual_blocks=1,
        checkpoint_every=5,
        use_pallas=False,
        data_parallel=False,
        watch_freq=2,  # steps 0 (and 2, 4, ...) are watch steps
    )
    dataset = MultiDomainDataset.build(cfg.source_dir, cfg.target_dir)
    trainer = Trainer(cfg, dataset, wandb_run=FakeRun())
    assert trainer.train_step_watch is not None
    trainer.train(start_epoch=0)

    hist_logs = [d for d in logged
                 if any(k.startswith("gradients/") for k in d)]
    assert hist_logs, "watch steps must log gradient histograms"
    n_tensors = len(jax.tree_util.tree_leaves(trainer.state.gen_params)) + len(
        jax.tree_util.tree_leaves(trainer.state.disc_params))
    hist_keys = [k for k in hist_logs[0] if k.startswith("gradients/")]
    assert len(hist_keys) == n_tensors
    assert all(isinstance(hist_logs[0][k], FakeHistogram) for k in hist_keys)
    # Histograms ride the SAME wandb.log call as the step's losses so they
    # share the step axis (a separate log() call would shift every later
    # metric by one auto-incremented wandb step).
    assert "loss/G_loss" in hist_logs[0]
    loss_logs = [d for d in logged if "loss/G_loss" in d]
    assert loss_logs and all("_grad_hists" not in d for d in loss_logs)


def test_gradient_histograms_keys_disjoint(setup):
    """G and D trees must not collide in the flat name space."""
    _, _, state, *_ = setup
    hs = gradient_histograms(state.gen_params, state.disc_params, bins=4)
    n = len(jax.tree_util.tree_leaves(state.gen_params)) + len(
        jax.tree_util.tree_leaves(state.disc_params))
    assert len(hs) == n
