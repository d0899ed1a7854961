#!/usr/bin/env python
"""Per-checkpoint quality trajectory (VERDICT r2 next-round #4).

Runs tools/eval_quality.py for every epoch checkpoint found, aggregates
the per-domain metrics, and commits a trajectory PLOT + CSV so the
quality-over-training claim is a committed artifact rather than a
git-history pointer.

Usage:
    python tools/eval_quality_trajectory.py \
        --ckpt_root results/tomato_r2/checkpoints [--every 2] \
        [--out docs/quality/trajectory]

Each checkpoint evaluation reuses eval_quality.py (proxy-FID + the
weights-free color-Frechet / hist-TV metrics) over ALL domains.
"""

import argparse
import json
import os
import re
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_root", default="results/tomato_r2/checkpoints")
    ap.add_argument("--extra_root", default="results/tomato_r3/checkpoints",
                    help="second checkpoint root (the resumed run), "
                         "skipped when absent")
    ap.add_argument("--out", default="docs/quality/trajectory")
    ap.add_argument("--n_images", type=int, default=50)
    ap.add_argument("--source_dir",
                    default="/root/reference/data/src/Tomato_healthy")
    ap.add_argument("--ref_dir", default="/root/reference/data/ref")
    ap.add_argument("--every", type=int, default=1,
                    help="evaluate every Nth checkpoint")
    ap.add_argument("--eval_timeout", type=int, default=1800,
                    help="seconds per checkpoint eval before it is killed "
                         "and retried once (a wedged remote-TPU RPC "
                         "otherwise stalls the whole batch)")
    args = ap.parse_args()

    ckpts = []
    for root in (args.ckpt_root, args.extra_root):
        if not os.path.isdir(root):
            continue
        for d in os.listdir(root):
            m = re.fullmatch(r"epoch_(\d+)", d)
            if m:
                ckpts.append((int(m.group(1)), os.path.join(root, d)))
    ckpts = sorted({e: p for e, p in sorted(ckpts)}.items())
    ckpts = ckpts[:: args.every]
    if not ckpts:
        sys.exit(f"no epoch_* checkpoints under {args.ckpt_root}")
    print(f"evaluating {len(ckpts)} checkpoints: "
          f"{[e for e, _ in ckpts]}", flush=True)

    os.makedirs(args.out, exist_ok=True)
    rows = {}
    for epoch, path in ckpts:
        dst = os.path.join(args.out, f"epoch_{epoch}")
        qj = os.path.join(dst, "quality.json")
        if not os.path.exists(qj):
            cmd = [
                sys.executable, "tools/eval_quality.py",
                "--checkpoint", path, "--out", dst,
                "--source_dir", args.source_dir, "--ref_dir", args.ref_dir,
                "--n_images", str(args.n_images), "--domains", "0",
                "--samples", "0",
            ]
            rc = None
            for attempt in (1, 2):
                try:
                    rc = subprocess.call(cmd, timeout=args.eval_timeout)
                except subprocess.TimeoutExpired:
                    print(f"epoch {epoch}: eval timed out after "
                          f"{args.eval_timeout}s (attempt {attempt})",
                          flush=True)
                    rc = None
                    continue
                if rc == 0:
                    break
                print(f"epoch {epoch}: eval failed rc={rc} "
                      f"(attempt {attempt})", flush=True)
            if rc != 0:
                continue
        with open(qj) as f:
            rows[epoch] = json.load(f)
        print(f"epoch {epoch}: done", flush=True)

    if not rows:
        sys.exit("no successful evaluations")
    domains = sorted(next(iter(rows.values())).keys())
    epochs = sorted(rows)

    # CSV (one row per epoch x domain)
    csv_path = os.path.join(args.out, "trajectory.csv")
    with open(csv_path, "w") as f:
        f.write("epoch,domain,proxy_fid_gen,proxy_fid_src,"
                "color_frechet_gen,color_frechet_src,hist_tv_gen,"
                "hist_tv_src\n")
        for e in epochs:
            for d in domains:
                r = rows[e].get(d)
                if r:
                    f.write(f"{e},{d},{r['proxy_fid_generated_vs_ref']},"
                            f"{r['proxy_fid_source_vs_ref']},"
                            f"{r['color_frechet_generated_vs_ref']},"
                            f"{r['color_frechet_source_vs_ref']},"
                            f"{r['hist_tv_generated_vs_ref']},"
                            f"{r['hist_tv_source_vs_ref']}\n")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig, axes = plt.subplots(1, 2, figsize=(13, 5))
    for d in domains:
        # x and y filtered TOGETHER: a domain missing from a middle epoch
        # must drop that epoch's x too, not shift later points left.
        xs = [e for e in epochs if d in rows[e]]
        axes[0].plot(xs, [rows[e][d]["proxy_fid_generated_vs_ref"]
                          for e in xs], alpha=0.4, lw=1)
        axes[1].plot(xs, [rows[e][d]["color_frechet_generated_vs_ref"]
                          for e in xs], alpha=0.4, lw=1)
    mean_fid = [np.mean([rows[e][d]["proxy_fid_generated_vs_ref"]
                         for d in domains if d in rows[e]]) for e in epochs]
    base_fid = [np.mean([rows[e][d]["proxy_fid_source_vs_ref"]
                         for d in domains if d in rows[e]]) for e in epochs]
    axes[0].plot(epochs, mean_fid, "k-", lw=2.5, label="generated (mean)")
    axes[0].plot(epochs, base_fid, "k--", lw=1.5,
                 label="untranslated baseline")
    axes[0].set_title("proxy-FID (random-VGG features) vs epoch")
    mean_cf = [np.mean([rows[e][d]["color_frechet_generated_vs_ref"]
                        for d in domains if d in rows[e]]) for e in epochs]
    base_cf = [np.mean([rows[e][d]["color_frechet_source_vs_ref"]
                        for d in domains if d in rows[e]]) for e in epochs]
    axes[1].plot(epochs, mean_cf, "k-", lw=2.5, label="generated (mean)")
    axes[1].plot(epochs, base_cf, "k--", lw=1.5,
                 label="untranslated baseline")
    axes[1].set_title("color-Frechet (weights-free) vs epoch")
    for ax in axes:
        ax.set_xlabel("epoch")
        ax.legend()
        ax.grid(alpha=0.3)
    fig.tight_layout()
    plot_path = os.path.join(args.out, "trajectory.png")
    fig.savefig(plot_path, dpi=110)
    print(f"wrote {csv_path} and {plot_path}")


if __name__ == "__main__":
    main()
