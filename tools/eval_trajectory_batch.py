#!/usr/bin/env python
"""Single-process quality trajectory over EMA snapshots (VERDICT r4 #4).

One engine, one compile: the jitted generate/encode functions take params
as arguments, so each checkpoint just swaps the param pytrees — no process
respawn, no recompile, and the checkpoint-independent source-vs-ref
baseline metrics are computed ONCE per domain instead of once per
(checkpoint x domain) like the subprocess runner (eval_quality_trajectory).

Writes the same per-epoch quality.json layout as tools/eval_quality.py
plus the aggregate trajectory.csv/png, so downstream tooling is unchanged.

Usage:
    python tools/eval_trajectory_batch.py \
        --snap_root results/tomato_r6/ema_snapshots \
        --out docs/quality_r6/trajectory [--n_images 50]
"""

import argparse
import json
import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snap_root", default="results/tomato_r6/ema_snapshots")
    ap.add_argument("--out", default="docs/quality_r6/trajectory")
    ap.add_argument("--n_images", type=int, default=50)
    ap.add_argument("--source_dir",
                    default="/root/reference/data/src/Tomato_healthy")
    ap.add_argument("--ref_dir", default="/root/reference/data/ref")
    ap.add_argument("--batch_size", type=int, default=32)
    args = ap.parse_args()

    import msig_tpu

    msig_tpu.honor_jax_platforms_env()
    msig_tpu.enable_persistent_compile_cache()
    import jax
    from PIL import Image

    from msig_tpu.config import InferenceConfig
    from msig_tpu.data import list_image_files
    from msig_tpu.data.pipeline import load_inference_image
    from msig_tpu.eval.fid import fid_between_dirs
    from msig_tpu.eval.pixel_stats import pixel_metrics_between_dirs
    from msig_tpu.infer.engine import InferenceEngine
    from msig_tpu.infer.loading import load_inference_params

    snaps = []
    for d in os.listdir(args.snap_root):
        m = re.fullmatch(r"epoch_(\d+)", d)
        if m and os.path.exists(os.path.join(args.snap_root, d,
                                             "ema_g_se_fp16.npz")):
            snaps.append((int(m.group(1)), os.path.join(args.snap_root, d)))
    snaps.sort()
    if not snaps:
        sys.exit(f"no snapshots under {args.snap_root}")
    print(f"evaluating {len(snaps)} snapshots: {[e for e, _ in snaps]}",
          flush=True)

    domains = sorted(d for d in os.listdir(args.ref_dir)
                     if os.path.isdir(os.path.join(args.ref_dir, d)))
    num_domains = len(domains) + 1

    src_files = list_image_files(args.source_dir)[: args.n_images]
    src_imgs = np.stack([load_inference_image(p, 256) for p in src_files])
    ref_imgs = {}
    for name in domains:
        ref_d = os.path.join(args.ref_dir, name)
        ref_imgs[name] = np.stack([load_inference_image(p, 256)
                                   for p in list_image_files(ref_d)])

    # checkpoint-independent baselines, once per domain
    base = {}
    for name in domains:
        ref_d = os.path.join(args.ref_dir, name)
        fid_src = fid_between_dirs(args.source_dir, ref_d, image_size=256)
        cf_src, tv_src = pixel_metrics_between_dirs(args.source_dir, ref_d, 256)
        base[name] = (float(fid_src), float(cf_src), float(tv_src))
        print(f"baseline {name}: proxy-FID {fid_src:.6f}", flush=True)

    cfg = InferenceConfig(image_size=256, batch_size=args.batch_size)
    eng = None
    os.makedirs(args.out, exist_ok=True)
    rows = {}
    for epoch, snap in snaps:
        dst = os.path.join(args.out, f"epoch_{epoch}")
        qj = os.path.join(dst, "quality.json")
        if os.path.exists(qj):
            with open(qj) as f:
                rows[epoch] = json.load(f)
            print(f"epoch {epoch}: cached", flush=True)
            continue
        gen_params, se_params, meta, used_ema = load_inference_params(
            snap, cfg, num_domains)
        if eng is None:
            eng = InferenceEngine.build(
                cfg, num_domains, gen_params, se_params,
                n_residual_blocks=int(meta.get("n_residual_blocks", 8)),
                style_dim=int(meta.get("style_dim", 256)))
        else:
            # same structure every snapshot: swap pytrees, reuse compiles
            object.__setattr__(eng, "gen_params", gen_params)
            object.__setattr__(eng, "se_params", se_params)
        report = {}
        for name in domains:
            d_idx = domains.index(name) + 1
            ref_d = os.path.join(args.ref_dir, name)
            bank = eng.encode_styles(ref_imgs[name], d_idx)
            out_dir = os.path.join(dst, "generated", name)
            os.makedirs(out_dir, exist_ok=True)

            def batches():
                for i in range(0, len(src_imgs), args.batch_size):
                    yield (src_imgs[i: i + args.batch_size],
                           [os.path.basename(p)
                            for p in src_files[i: i + args.batch_size]])

            for out, names in eng.translate_batches(batches(), bank, "average"):
                u8 = np.clip((np.asarray(out, np.float32) + 1.0) * 127.5,
                             0, 255).astype(np.uint8)
                for img, nm in zip(u8, names):
                    Image.fromarray(img).save(os.path.join(out_dir, nm))

            fid_gen = fid_between_dirs(out_dir, ref_d, image_size=256)
            cf_gen, tv_gen = pixel_metrics_between_dirs(out_dir, ref_d, 256)
            fid_src, cf_src, tv_src = base[name]
            report[name] = {
                "proxy_fid_generated_vs_ref": round(float(fid_gen), 6),
                "proxy_fid_source_vs_ref": round(fid_src, 6),
                "color_frechet_generated_vs_ref": round(float(cf_gen), 6),
                "color_frechet_source_vs_ref": round(cf_src, 6),
                "hist_tv_generated_vs_ref": round(float(tv_gen), 4),
                "hist_tv_source_vs_ref": round(tv_src, 4),
            }
        os.makedirs(dst, exist_ok=True)
        with open(qj, "w") as f:
            json.dump(report, f, indent=2)
        rows[epoch] = report
        mean_fid = np.mean([r["proxy_fid_generated_vs_ref"]
                            for r in report.values()])
        print(f"epoch {epoch}: done (mean proxy-FID {mean_fid:.6f})",
              flush=True)

    # aggregate CSV + plot (same format as eval_quality_trajectory.py)
    epochs = sorted(rows)
    csv_path = os.path.join(args.out, "trajectory.csv")
    with open(csv_path, "w") as f:
        f.write("epoch,domain,proxy_fid_gen,proxy_fid_src,"
                "color_frechet_gen,color_frechet_src,hist_tv_gen,"
                "hist_tv_src\n")
        for e in epochs:
            for d in sorted(rows[e]):
                r = rows[e][d]
                f.write(f"{e},{d},{r['proxy_fid_generated_vs_ref']},"
                        f"{r['proxy_fid_source_vs_ref']},"
                        f"{r['color_frechet_generated_vs_ref']},"
                        f"{r['color_frechet_source_vs_ref']},"
                        f"{r['hist_tv_generated_vs_ref']},"
                        f"{r['hist_tv_source_vs_ref']}\n")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    doms = sorted(rows[epochs[0]])
    fig, axes = plt.subplots(1, 2, figsize=(13, 5))
    for d in doms:
        xs = [e for e in epochs if d in rows[e]]
        axes[0].plot(xs, [rows[e][d]["proxy_fid_generated_vs_ref"]
                          for e in xs], alpha=0.4, lw=1)
        axes[1].plot(xs, [rows[e][d]["color_frechet_generated_vs_ref"]
                          for e in xs], alpha=0.4, lw=1)
    mean_fid = [np.mean([rows[e][d]["proxy_fid_generated_vs_ref"]
                         for d in doms if d in rows[e]]) for e in epochs]
    base_fid = [np.mean([rows[e][d]["proxy_fid_source_vs_ref"]
                         for d in doms if d in rows[e]]) for e in epochs]
    axes[0].plot(epochs, mean_fid, "k-", lw=2.5, label="generated (mean)")
    axes[0].plot(epochs, base_fid, "k--", lw=1.5, label="untranslated baseline")
    axes[0].set_title("proxy-FID (random-VGG features) vs epoch")
    mean_cf = [np.mean([rows[e][d]["color_frechet_generated_vs_ref"]
                        for d in doms if d in rows[e]]) for e in epochs]
    base_cf = [np.mean([rows[e][d]["color_frechet_source_vs_ref"]
                        for d in doms if d in rows[e]]) for e in epochs]
    axes[1].plot(epochs, mean_cf, "k-", lw=2.5, label="generated (mean)")
    axes[1].plot(epochs, base_cf, "k--", lw=1.5, label="untranslated baseline")
    axes[1].set_title("color-Frechet (weights-free) vs epoch")
    for ax in axes:
        ax.set_xlabel("epoch")
        ax.legend()
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "trajectory.png"), dpi=110)
    print(f"wrote {csv_path} and trajectory.png over {len(epochs)} epochs",
          flush=True)


if __name__ == "__main__":
    main()
