#!/usr/bin/env python
"""Speed-of-light analysis of the b32 train step (VERDICT r2 weak #2).

Compiles the shipping fused step at the target batch and pulls XLA's own
``cost_analysis()`` (FLOPs + bytes accessed) from the executable, then
relates it to the measured step time:

    achieved TFLOP/s   = flops / step_time
    MXU utilization    = achieved / peak (v5e bf16 ~197 TFLOP/s)
    HBM-bound floor    = bytes / 819 GB/s (v5e)

Together with the staged budget (tools/profile_train_budget.py) and the
structural sweep (tools/bench_train_variants.py), this is the
trace-backed argument for what the remaining milliseconds are made of.

Usage: python tools/flops_budget.py [--batch 32] [--size 256] [--time_ms 756]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msig_tpu.config import TrainConfig
from msig_tpu.losses import init_vgg_params
from msig_tpu.train.schedule import WEIGHT_KEYS
from msig_tpu.train.state import Models, create_train_state, make_optimizers
from msig_tpu.train.step import make_train_step

V5E_BF16_TFLOPS = 197.0  # per chip, dense bf16
V5E_INT8_TOPS = 394.0
V5E_HBM_GBS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--time_ms", type=float, default=None,
                    help="measured step time to relate the counts to")
    args = ap.parse_args()

    B, S = args.batch, args.size
    cfg = TrainConfig(image_size=S, batch_size=B, compute_dtype="bfloat16")
    models = Models.from_config(cfg, num_domains=10, dtype=jnp.bfloat16)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    tx_g, tx_d = make_optimizers(cfg)
    vgg = init_vgg_params()
    rng = np.random.default_rng(0)
    batch = {
        "source": rng.integers(0, 256, (B, S, S, 3), dtype=np.uint8),
        "target": rng.integers(0, 256, (B, S, S, 3), dtype=np.uint8),
        "source_domain": np.zeros((B,), np.int32),
        "target_domain": np.ones((B,), np.int32),
    }
    step = jax.jit(make_train_step(
        models, tx_g, tx_d, cfg.ema_beta, compute_dtype=jnp.bfloat16))
    lr = jnp.float32(2e-4)
    w = jnp.asarray([1.0] * len(WEIGHT_KEYS), jnp.float32)

    lowered = step.lower(state, batch, vgg, lr, lr, w)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", float("nan")))
    bytes_ = float(ca.get("bytes accessed", float("nan")))
    mem = compiled.memory_analysis()

    print(f"b{B} {S}^2 bf16 fused train step — XLA cost analysis:")
    print(f"  flops          : {flops:.3e}  ({flops / 1e12:.2f} TFLOP)")
    print(f"  bytes accessed : {bytes_:.3e}  ({bytes_ / 1e9:.2f} GB)")
    if mem is not None:
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, k, None)
            if v is not None:
                print(f"  {k:<28}: {v / 1e9:.3f} GB")
    print(f"  compute floor @ {V5E_BF16_TFLOPS:.0f} TFLOP/s : "
          f"{flops / (V5E_BF16_TFLOPS * 1e12) * 1000:.1f} ms")
    print(f"  HBM floor    @ {V5E_HBM_GBS:.0f} GB/s      : "
          f"{bytes_ / (V5E_HBM_GBS * 1e9) * 1000:.1f} ms")
    if args.time_ms:
        t = args.time_ms / 1000
        print(f"  at measured {args.time_ms:.1f} ms: "
              f"{flops / t / 1e12:.1f} TFLOP/s achieved "
              f"({flops / t / 1e12 / V5E_BF16_TFLOPS * 100:.0f}% of bf16 peak), "
              f"{bytes_ / t / 1e9:.0f} GB/s HBM "
              f"({bytes_ / t / 1e9 / V5E_HBM_GBS * 100:.0f}% of peak)")


if __name__ == "__main__":
    main()
