"""tools/export_demo_checkpoint.py: full checkpoint -> portable fp16 npz
demo dir, loadable by the inference CLI (loading.py layout 3)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_import_tool import torch_dir  # noqa: F401  (fixture)


def _run_export(torch_dir, out, extra=()):
    cmd = [
        sys.executable, "tools/export_demo_checkpoint.py",
        "--checkpoint", str(torch_dir), "--out", str(out),
        "--num_domains", "3", "--style_dim", "16",
        "--n_residual_blocks", "2", "--image_size", "32", *extra,
    ]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=os.path.dirname(os.path.dirname(__file__)),
                          timeout=300)


@pytest.mark.heavy
def test_export_roundtrip(torch_dir, tmp_path):  # noqa: F811
    out = tmp_path / "demo"
    res = _run_export(torch_dir, out)
    assert res.returncode == 0, res.stderr[-2000:]
    assert (out / "ema_g_se_fp16.npz").exists()
    with open(out / "meta.json") as f:
        meta = json.load(f)
    assert meta["num_domains"] == 3
    assert meta["n_residual_blocks"] == 2

    from msig_tpu.config import InferenceConfig
    from msig_tpu.infer.loading import load_inference_params

    cfg = InferenceConfig(style_dim=16, n_residual_blocks=2, image_size=32)
    # Source of truth: the torch dir loaded directly (no fp16 round trip).
    gen0, se0, _, _ = load_inference_params(str(torch_dir), cfg, 3)
    gen1, se1, meta1, used_ema = load_inference_params(str(out), cfg, 3)
    assert meta1["num_domains"] == 3

    flat0 = {"/".join(p): np.asarray(v) for p, v in _flat(gen0)}
    flat1 = {"/".join(p): np.asarray(v) for p, v in _flat(gen1)}
    assert set(flat0) == set(flat1)
    for k in flat0:
        np.testing.assert_allclose(flat0[k], flat1[k], rtol=1e-3, atol=1e-3), k
    s0 = {"/".join(p): np.asarray(v) for p, v in _flat(se0)}
    s1 = {"/".join(p): np.asarray(v) for p, v in _flat(se1)}
    assert set(s0) == set(s1)
    for k in s0:
        np.testing.assert_allclose(s0[k], s1[k], rtol=1e-3, atol=1e-3)


def _flat(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat(v, prefix + (k,))
    else:
        yield prefix, tree


def test_num_domains_guard(torch_dir, tmp_path):  # noqa: F811
    out = tmp_path / "demo"
    assert _run_export(torch_dir, out).returncode == 0
    from msig_tpu.config import InferenceConfig
    from msig_tpu.infer.loading import load_inference_params

    cfg = InferenceConfig(style_dim=16, n_residual_blocks=2, image_size=32)
    with pytest.raises(ValueError, match="3 domains"):
        load_inference_params(str(out), cfg, 5)


@pytest.mark.heavy
def test_demo_dir_generates(torch_dir, tmp_path):  # noqa: F811
    """The demo layout drives the actual generator forward."""
    out = tmp_path / "demo"
    assert _run_export(torch_dir, out).returncode == 0

    import jax.numpy as jnp

    from msig_tpu.config import InferenceConfig
    from msig_tpu.infer.engine import InferenceEngine

    cfg = InferenceConfig(style_dim=16, n_residual_blocks=2, image_size=32,
                          batch_size=2)
    from msig_tpu.infer.loading import load_inference_params

    gen, se, meta, _ = load_inference_params(str(out), cfg, 3)
    eng = InferenceEngine.build(
        cfg, 3, gen, se,
        n_residual_blocks=meta.get("n_residual_blocks"),
        style_dim=meta.get("style_dim"),
    )
    imgs = np.random.default_rng(0).integers(0, 255, (2, 32, 32, 3),
                                             dtype=np.uint8)
    styles = eng.encode_styles(imgs, 1)
    fn = eng._generate_fn()
    out_imgs = fn(eng.gen_params, jnp.asarray(imgs), jnp.asarray(styles))
    assert np.asarray(out_imgs).shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out_imgs, dtype=np.float32)).all()


@pytest.mark.heavy
def test_native_checkpoint_beats_demo_npz(tmp_path):
    """A full native checkpoint (meta.json + Orbax state/) in the same
    directory as a demo npz must win: the fp16 demo is a lossy derivative
    and must never silently shadow the full weights (e.g. after exporting
    with --out pointed at the checkpoint dir itself)."""
    from PIL import Image

    from msig_tpu.config import InferenceConfig, TrainConfig
    from msig_tpu.data.dataset import MultiDomainDataset
    from msig_tpu.infer.loading import load_inference_params
    from msig_tpu.train.trainer import Trainer

    rng = np.random.default_rng(1)
    src = tmp_path / "src"
    src.mkdir()
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)
                        ).save(src / f"s{i}.jpg")
    ref = tmp_path / "ref"
    (ref / "DomA").mkdir(parents=True)
    Image.fromarray(rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)
                    ).save(ref / "DomA" / "r0.jpg")
    tcfg = TrainConfig(
        source_dir=str(src), target_dir=str(ref),
        save_dir_base=str(tmp_path / "results"), exp_name="t", epochs=1,
        image_size=32, batch_size=2, save_freq=10, style_dim=16,
        n_residual_blocks=1, checkpoint_every=1, use_pallas=False,
    )
    Trainer(tcfg, MultiDomainDataset.build(tcfg.source_dir, tcfg.target_dir)).train(0)
    ckpt = os.path.join(tcfg.save_dir_base, "t", "checkpoints", "epoch_1")

    cfg = InferenceConfig(style_dim=16, n_residual_blocks=1, image_size=32)
    gen_native, _, _, _ = load_inference_params(ckpt, cfg, 2)

    # Export the demo npz INTO the checkpoint dir (meta.json overwritten by
    # the export's own meta — still a valid native dir: state/ is intact).
    res = subprocess.run(
        [sys.executable, "tools/export_demo_checkpoint.py",
         "--checkpoint", ckpt, "--out", ckpt,
         "--num_domains", "2", "--style_dim", "16",
         "--n_residual_blocks", "1", "--image_size", "32"],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        cwd=os.path.dirname(os.path.dirname(__file__)), timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert os.path.exists(os.path.join(ckpt, "ema_g_se_fp16.npz"))

    gen_again, _, _, _ = load_inference_params(ckpt, cfg, 2)
    f0 = {"/".join(p): np.asarray(v) for p, v in _flat(gen_native)}
    f1 = {"/".join(p): np.asarray(v) for p, v in _flat(gen_again)}
    # Native full-precision weights, NOT the fp16 round trip: exact match.
    for k in f0:
        np.testing.assert_array_equal(f0[k], f1[k])
