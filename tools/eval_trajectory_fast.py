#!/usr/bin/env python
"""In-memory quality trajectory over EMA snapshots (VERDICT r4 #4).

Fastest evaluator of the family: one engine + one jitted feature
extractor for ALL checkpoints, metrics computed straight from the
in-memory generated arrays (no PNG round trip through disk), and every
checkpoint-independent quantity (reference feature stats, reference
descriptor stats, reference histograms, source-vs-ref baselines)
precomputed ONCE. Emits the same per-epoch quality.json rows and the
same trajectory.csv/png as tools/eval_quality_trajectory.py.

~15-25 s per checkpoint on the TPU vs ~2-3 min for the disk-based
subprocess runner — sized for an end-of-round window.

Usage:
    python tools/eval_trajectory_fast.py \
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
    ap.add_argument("--samples", type=int, default=3,
                    help="sample source|generated strips saved for the "
                         "LAST checkpoint per domain (0 = none)")
    args = ap.parse_args()

    import msig_tpu

    msig_tpu.honor_jax_platforms_env()
    msig_tpu.enable_persistent_compile_cache()
    from PIL import Image

    from msig_tpu.config import InferenceConfig
    from msig_tpu.data import list_image_files
    from msig_tpu.data.pipeline import load_inference_image
    from msig_tpu.eval.fid import (activation_statistics, frechet_distance,
                                   vgg_feature_fn)
    from msig_tpu.eval.pixel_stats import (_pooled_hist,
                                           color_texture_descriptor)
    from msig_tpu.infer.engine import InferenceEngine
    from msig_tpu.infer.loading import load_inference_params
    from msig_tpu.losses import get_vgg_params

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

    feature_fn = vgg_feature_fn(get_vgg_params(None))

    def feats(imgs_u8):
        out = []
        for i in range(0, len(imgs_u8), args.batch_size):
            out.append(feature_fn(imgs_u8[i: i + args.batch_size]))
        return np.concatenate(out, axis=0)

    def fid_from_stats(imgs_u8, ref_stats):
        mu, s = activation_statistics(feats(imgs_u8))
        return frechet_distance(mu, s, *ref_stats)

    def cf_from_stats(imgs_u8, ref_stats):
        d = np.stack([color_texture_descriptor(i) for i in imgs_u8])
        mu, s = activation_statistics(d)
        return frechet_distance(mu, s, *ref_stats)

    def tv_from_hist(imgs_u8, ref_hist):
        return float(0.5 * np.abs(_pooled_hist(imgs_u8) - ref_hist).sum())

    # ---- checkpoint-independent precomputes -------------------------------
    src_files = list_image_files(args.source_dir)
    src_all = np.stack([load_inference_image(p, 256) for p in src_files])
    src_eval = src_all[: args.n_images]
    print(f"loaded {len(src_all)} source images", flush=True)

    ref = {}
    for name in domains:
        ref_d = os.path.join(args.ref_dir, name)
        imgs = np.stack([load_inference_image(p, 256)
                         for p in list_image_files(ref_d)])
        fid_stats = activation_statistics(feats(imgs))
        cf_stats = activation_statistics(
            np.stack([color_texture_descriptor(i) for i in imgs]))
        hist = _pooled_hist(imgs)
        base = (float(fid_from_stats(src_all, fid_stats)),
                float(cf_from_stats(src_all, cf_stats)),
                float(tv_from_hist(src_all, hist)))
        ref[name] = (imgs, fid_stats, cf_stats, hist, base)
        print(f"baseline {name}: proxy-FID {base[0]:.6f}", flush=True)

    cfg = InferenceConfig(image_size=256, batch_size=args.batch_size)
    eng = None
    os.makedirs(args.out, exist_ok=True)
    rows = {}
    for k, (epoch, snap) in enumerate(snaps):
        dst = os.path.join(args.out, f"epoch_{epoch}")
        qj = os.path.join(dst, "quality.json")
        if os.path.exists(qj):
            with open(qj) as f:
                rows[epoch] = json.load(f)
            print(f"epoch {epoch}: cached", flush=True)
            continue
        gen_params, se_params, meta, _ = load_inference_params(
            snap, cfg, num_domains)
        if eng is None:
            eng = InferenceEngine.build(
                cfg, num_domains, gen_params, se_params,
                n_residual_blocks=int(meta.get("n_residual_blocks", 8)),
                style_dim=int(meta.get("style_dim", 256)))
        else:
            object.__setattr__(eng, "gen_params", gen_params)
            object.__setattr__(eng, "se_params", se_params)
        report = {}
        last = k == len(snaps) - 1
        for name in domains:
            d_idx = domains.index(name) + 1
            ref_imgs, fid_stats, cf_stats, hist, base = ref[name]
            bank = eng.encode_styles(ref_imgs, d_idx)

            def batches():
                for i in range(0, len(src_eval), args.batch_size):
                    chunk = src_eval[i: i + args.batch_size]
                    yield chunk, [str(j) for j in range(len(chunk))]

            gen_imgs = []
            for out, _names in eng.translate_batches(batches(), bank,
                                                     "average"):
                gen_imgs.append(np.clip(
                    (np.asarray(out, np.float32) + 1.0) * 127.5,
                    0, 255).astype(np.uint8))
            gen_imgs = np.concatenate(gen_imgs, axis=0)

            report[name] = {
                "proxy_fid_generated_vs_ref":
                    round(float(fid_from_stats(gen_imgs, fid_stats)), 6),
                "proxy_fid_source_vs_ref": round(base[0], 6),
                "color_frechet_generated_vs_ref":
                    round(float(cf_from_stats(gen_imgs, cf_stats)), 6),
                "color_frechet_source_vs_ref": round(base[1], 6),
                "hist_tv_generated_vs_ref":
                    round(tv_from_hist(gen_imgs, hist), 4),
                "hist_tv_source_vs_ref": round(base[2], 4),
            }
            if last and args.samples > 0:
                strip = [np.concatenate([src_eval[i], gen_imgs[i]], axis=1)
                         for i in range(min(args.samples, len(gen_imgs)))]
                os.makedirs(dst, exist_ok=True)
                Image.fromarray(np.concatenate(strip, axis=0)).save(
                    os.path.join(dst, f"samples_{name}.jpg"), quality=92)
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
