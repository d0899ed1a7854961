"""tools/import_torch_checkpoint.py: torch dir -> native Orbax checkpoint."""

import json
import subprocess
import sys

import pytest
import torch

from tests.test_torch_import import make_disc_sd, make_gen_sd, make_se_sd


@pytest.fixture()
def torch_dir(tmp_path):
    d = tmp_path / "tdir"
    d.mkdir()
    torch.save(
        {
            "G_A2B": make_gen_sd(), "G_B2A": make_gen_sd(),
            "SE_A": make_se_sd(), "SE_B": make_se_sd(),
            "D_A": make_disc_sd(), "D_B": make_disc_sd(),
            "num_domains": 3,
            "loss_history": {"G_loss": [1.0], "D_loss": [0.5]},
        },
        d / "checkpoint.pth",
    )
    return d


@pytest.mark.heavy
def test_tool_converts_and_native_load_works(torch_dir, tmp_path):
    out = tmp_path / "native"
    env_cmd = [
        sys.executable, "tools/import_torch_checkpoint.py",
        "--torch_dir", str(torch_dir), "--out", str(out),
        "--style_dim", "16", "--n_residual_blocks", "2", "--image_size", "32",
    ]
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run(env_cmd, capture_output=True, text=True, env=env,
                         cwd=os.path.dirname(os.path.dirname(__file__)), timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    with open(out / "meta.json") as f:
        meta = json.load(f)
    assert meta["num_domains"] == 3
    assert meta["loss_history"]["G_loss"] == [1.0]

    # native load path accepts the converted checkpoint
    from msig_tpu.config import InferenceConfig
    from msig_tpu.infer.loading import load_inference_params

    cfg = InferenceConfig(style_dim=16, n_residual_blocks=2, image_size=32)
    gen, se_b, meta2, used_ema = load_inference_params(str(out), cfg, 3)
    assert meta2["num_domains"] == 3
