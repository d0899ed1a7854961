"""Multi-host DCN data parallelism: 2 real processes, one global mesh.

Spawns two ``tests/_multihost_worker.py`` processes that each hold 2 virtual
CPU devices, initialize ``jax.distributed`` against a local coordinator, and
run ONE fused train step sharded over the global 4-device mesh. The step's
gradient all-reduce must therefore cross the process boundary (simulated
DCN). Asserts both workers report identical replicated metrics and that
they match a single-process run of the same step on the same global batch.

The reference has no distributed support (/root/reference/main.py:30-35);
this validates the GSPMD multi-host capability promised in SURVEY.md §2.3.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _reference_metrics():
    """Single-process fused step on the same global batch (CPU, one device)."""
    import jax
    import jax.numpy as jnp

    from msig_tpu.config import TrainConfig
    from msig_tpu.losses import init_vgg_params
    from msig_tpu.train import (
        Models, create_train_state, current_loss_weights, make_optimizers,
        make_train_step, weights_vector,
    )

    cfg = TrainConfig(image_size=32, batch_size=4, style_dim=16,
                      n_residual_blocks=1, use_pallas=False)
    models = Models.from_config(cfg, num_domains=3)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    vgg = init_vgg_params()
    tx_g, tx_d = make_optimizers(cfg)
    step = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta))

    rng = np.random.default_rng(0)
    batch = {
        "source": rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8),
        "target": rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8),
        "source_domain": np.zeros((4,), np.int32),
        "target_domain": rng.integers(1, 3, (4,), dtype=np.int32),
    }
    w = jnp.asarray(weights_vector(current_loss_weights(cfg.loss_weights, 0)),
                    jnp.float32)
    _, metrics = step(state, batch, vgg, jnp.float32(2e-4), jnp.float32(1e-4), w)
    return {k: float(jax.device_get(v)) for k, v in metrics.items()}


@pytest.mark.slow
def test_two_process_dcn_step_matches_single_process(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    # Strip the container's remote-TPU (axon) bootstrap: PALLAS_AXON_POOL_IPS
    # triggers a sitecustomize that registers a tunneled PJRT backend at
    # interpreter start, which would hijack the workers' CPU/distributed init.
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "PALLAS_AXON_POOL_IPS")}
    env["JAX_PLATFORMS"] = "cpu"
    # share the test compile cache so the two workers start warm
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/msig_jax_test_cache")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(worker)),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"

    metrics = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("METRICS ")]
        assert lines, f"no METRICS line in worker output:\n{out}"
        metrics.append(json.loads(lines[-1][len("METRICS "):]))

    # both processes see the same replicated metrics
    assert metrics[0].keys() == metrics[1].keys()
    for k in metrics[0]:
        np.testing.assert_allclose(metrics[0][k], metrics[1][k], rtol=1e-5,
                                   err_msg=f"{k} differs between processes")

    ref = _reference_metrics()
    for k in ref:
        np.testing.assert_allclose(
            metrics[0][k], ref[k], rtol=2e-3, atol=1e-4,
            err_msg=f"{k}: multi-process != single-process")
