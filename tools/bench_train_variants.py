#!/usr/bin/env python
"""Batch-32 train-step structural variants (VERDICT r2 weak #2 attack).

The published b32 budget (tools/profile_train_budget.py) puts ~470 of
776 ms in G-backward+Adam with 5 live generator-forward activation sets.
Variants trade activation liveness for recompute, and re-test the
batched-forward structures (round-2 losers at b32 from HBM pressure)
with the cycle-only remat freeing exactly the longest-lived activations:

  base          : shipping auto-structure at b32 (no remat, unbatched)
  remat-all     : jax.checkpoint on every generator forward
  remat-cycle   : checkpoint only cyc_A/cyc_B (longest liveness)
  bf+vp         : batched forwards + single-4B VGG (round-2: 994 ms)
  bf+vp+cycle   : same with cycle-only remat
  bf+vp+all     : same with full remat

Run solo (1 CPU core); readback-timed.

Each variant runs in its OWN subprocess (ONLY=<name> re-invocation):
the 2026-08-18 sweep showed every variant after the first failing with
RESOURCE_EXHAUSTED in a shared process — live compiled executables
accumulate HBM across variants. Subprocess isolation also contains
transient remote-compile HTTP 500s to the one variant they hit.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax


def _enable_jax_cache():
    d = os.environ["JAX_COMPILATION_CACHE_DIR"]
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_enable_jax_cache()
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msig_tpu.config import TrainConfig
from msig_tpu.losses import init_vgg_params
from msig_tpu.train.schedule import WEIGHT_KEYS
from msig_tpu.train.state import Models, create_train_state, make_optimizers
from msig_tpu.train.step import make_train_step

B = int(os.environ.get("B", "32"))
SIZE = int(os.environ.get("SIZE", "256"))
ITERS = int(os.environ.get("ITERS", "5"))

VARIANTS = [
    ("base", {}),
    ("remat-all", {"remat": True}),
    ("remat-cycle", {"remat": "cycle"}),
    ("bf+vp", {"batch_forwards": True, "vgg_pair": True}),
    ("bf+vp+cycle", {"batch_forwards": True, "vgg_pair": True,
                     "remat": "cycle"}),
    ("bf+vp+all", {"batch_forwards": True, "vgg_pair": True, "remat": True}),
    # 2x2B-chunked VGG pair: the 4B dedup at ~half the liveness — the
    # structure VERDICT r2 named for b32 (losses/vgg.py pair2).
    ("vp2x2", {"vgg_pair": "2x2"}),
    ("bf+vp2x2", {"batch_forwards": True, "vgg_pair": "2x2"}),
    ("bf+vp2x2+cycle", {"batch_forwards": True, "vgg_pair": "2x2",
                        "remat": "cycle"}),
]


def _sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def sweep_subprocesses():
    """Parent mode: one subprocess per variant, each fully isolated."""
    import subprocess

    print(f"B={B} {SIZE}^2 bf16 train-step variants (subprocess-isolated):")
    for name, _ in VARIANTS:
        env = dict(os.environ, ONLY=name, MSIG_VARIANT_CHILD="1")
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1800)
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("  ")]
        if lines:
            for ln in lines:
                print(ln, flush=True)
        else:
            tail = (r.stdout + r.stderr).strip().splitlines()[-1:]
            print(f"  {name:<12}: FAILED (rc={r.returncode} {tail})", flush=True)


def main():
    only = os.environ.get("ONLY")
    if not os.environ.get("MSIG_VARIANT_CHILD") and only is None:
        return sweep_subprocesses()
    cfg = TrainConfig(image_size=SIZE, batch_size=B, compute_dtype="bfloat16")
    models = Models.from_config(cfg, num_domains=10, dtype=jnp.bfloat16)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    tx_g, tx_d = make_optimizers(cfg)
    vgg = init_vgg_params()
    rng = np.random.default_rng(0)
    batch = {
        "source": jax.device_put(rng.integers(0, 256, (B, SIZE, SIZE, 3), dtype=np.uint8)),
        "target": jax.device_put(rng.integers(0, 256, (B, SIZE, SIZE, 3), dtype=np.uint8)),
        "source_domain": jnp.zeros((B,), jnp.int32),
        "target_domain": jnp.ones((B,), jnp.int32),
    }
    lr_g = jnp.float32(2e-4)
    lr_d = jnp.float32(1e-4)
    w = jnp.asarray([1.0] * len(WEIGHT_KEYS), jnp.float32)

    print(f"B={B} {SIZE}^2 bf16 train-step variants:")
    exact = bool(os.environ.get("MSIG_VARIANT_CHILD"))
    for name, kw in VARIANTS:
        if only and (name != only if exact else only not in name):
            continue
        step = jax.jit(make_train_step(
            models, tx_g, tx_d, cfg.ema_beta, compute_dtype=jnp.bfloat16, **kw))
        try:
            st, m = step(state, batch, vgg, lr_g, lr_d, w)
            _sync(m)
            t0 = time.perf_counter()
            st2 = state
            for _ in range(ITERS):
                st2, m = step(st2, batch, vgg, lr_g, lr_d, w)
            _sync(m)
            dt = (time.perf_counter() - t0) / ITERS * 1000
            print(f"  {name:<12}: {dt:7.1f} ms/step", flush=True)
        except Exception as e:  # OOM etc. — record, keep sweeping
            print(f"  {name:<12}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)


if __name__ == "__main__":
    main()
