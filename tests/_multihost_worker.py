"""Worker process for tests/test_multihost.py (not collected by pytest).

Each worker is one "host" of a 2-process DCN job: it initializes
``jax.distributed``, joins a global 4-device mesh (2 virtual CPU devices
per process), assembles its half of the global batch with
``jax.make_array_from_process_local_data``, runs ONE fused train step
(msig_tpu/train/step.py) data-parallel over the global mesh, and prints the
replicated step metrics as JSON. The parent asserts both processes print
identical metrics that match a single-process reference — i.e. the gradient
all-reduce really spanned processes (DCN capability promised in SURVEY §2.3;
the reference has no distributed support at all, /root/reference/main.py:30-35).
"""

import json
import os
import sys

# Must be configured before jax initializes any backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

PROC_ID = int(sys.argv[1])
NPROC = int(sys.argv[2])
COORD = sys.argv[3]

jax.distributed.initialize(
    coordinator_address=COORD, num_processes=NPROC, process_id=PROC_ID)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msig_tpu.config import TrainConfig  # noqa: E402
from msig_tpu.losses import init_vgg_params  # noqa: E402
from msig_tpu.parallel import jit_train_step, make_mesh, replicate  # noqa: E402
from msig_tpu.parallel.mesh import batch_sharding  # noqa: E402
from msig_tpu.train import (  # noqa: E402
    Models, create_train_state, current_loss_weights, make_optimizers,
    make_train_step, weights_vector,
)


def main():
    assert jax.process_count() == NPROC
    assert len(jax.devices()) == NPROC * 2  # global devices
    assert len(jax.local_devices()) == 2

    cfg = TrainConfig(image_size=32, batch_size=4, style_dim=16,
                      n_residual_blocks=1, use_pallas=False)
    models = Models.from_config(cfg, num_domains=3)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    vgg = init_vgg_params()
    tx_g, tx_d = make_optimizers(cfg)
    raw_step = make_train_step(models, tx_g, tx_d, cfg.ema_beta)

    # Deterministic global batch (same rng as the parent's reference); this
    # process contributes rows [2*pid, 2*pid+2).
    rng = np.random.default_rng(0)
    full = {
        "source": rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8),
        "target": rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8),
        "source_domain": np.zeros((4,), np.int32),
        "target_domain": rng.integers(1, 3, (4,), dtype=np.int32),
    }

    mesh = make_mesh()  # spans all 4 global devices
    sharding = batch_sharding(mesh)
    lo, hi = 2 * PROC_ID, 2 * PROC_ID + 2
    batch = {
        k: jax.make_array_from_process_local_data(sharding, v[lo:hi], v.shape)
        for k, v in full.items()
    }

    w = jnp.asarray(weights_vector(current_loss_weights(cfg.loss_weights, 0)),
                    jnp.float32)
    step = jit_train_step(raw_step, mesh)
    state_r = replicate(mesh, state)
    _, metrics = step(state_r, batch, replicate(mesh, vgg),
                      jnp.float32(2e-4), jnp.float32(1e-4), w)
    out = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    print("METRICS " + json.dumps(out, sort_keys=True), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
