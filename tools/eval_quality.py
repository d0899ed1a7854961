#!/usr/bin/env python
"""Quality evaluation of a trained checkpoint on the bundled tomato data.

For each (or --domains K) target domain:
  1. translate N source images via the inference engine (EMA weights),
  2. compute proxy-FID(generated, domain refs) and the no-translation
     baseline proxy-FID(source, domain refs).

A working style translation moves the generated distribution toward the
reference domain: FID(gen, ref) < FID(src, ref). With the random-VGG
feature extractor this is a PROXY metric (self-consistent within this
framework, not comparable to published FID); the reference's own product
is the visual result (/root/reference/trainer.py:276-360), so sample
images are also written.

Usage:
  python tools/eval_quality.py --checkpoint results/tomato_r2/checkpoints/epoch_150 \
      --out docs/quality --n_images 100 --domains 3
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--source_dir", default="/root/reference/data/src/Tomato_healthy")
    ap.add_argument("--ref_dir", default="/root/reference/data/ref")
    ap.add_argument("--out", default="docs/quality")
    ap.add_argument("--n_images", type=int, default=100)
    ap.add_argument("--domains", type=int, default=3,
                    help="number of target domains to evaluate (0 = all)")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--samples", type=int, default=6,
                    help="sample images copied into the report dir per domain")
    args = ap.parse_args()

    import msig_tpu

    msig_tpu.honor_jax_platforms_env()
    msig_tpu.enable_persistent_compile_cache()
    from PIL import Image

    from msig_tpu.config import InferenceConfig
    from msig_tpu.data import list_image_files
    from msig_tpu.data.pipeline import load_inference_image
    from msig_tpu.eval.fid import fid_between_dirs
    from msig_tpu.eval.pixel_stats import pixel_metrics_between_dirs
    from msig_tpu.infer.engine import InferenceEngine
    from msig_tpu.infer.loading import load_inference_params

    domains = sorted(d for d in os.listdir(args.ref_dir)
                     if os.path.isdir(os.path.join(args.ref_dir, d)))
    eval_domains = domains if args.domains <= 0 else domains[: args.domains]
    num_domains = len(domains) + 1

    cfg = InferenceConfig(image_size=256, batch_size=args.batch_size,
                          checkpoint_dir=args.checkpoint)
    gen_params, se_params, meta, used_ema = load_inference_params(
        args.checkpoint, cfg, num_domains)
    print(f"loaded {'EMA' if used_ema else 'raw'} weights", flush=True)
    eng = InferenceEngine.build(
        cfg, num_domains, gen_params, se_params,
        n_residual_blocks=int(meta.get("n_residual_blocks", 8)),
        style_dim=int(meta.get("style_dim", 256)),
    )

    src_files = list_image_files(args.source_dir)[: args.n_images]
    src_imgs = np.stack([load_inference_image(p, 256) for p in src_files])

    os.makedirs(args.out, exist_ok=True)
    report = {}
    for name in eval_domains:
        d_idx = domains.index(name) + 1
        ref_d = os.path.join(args.ref_dir, name)
        refs = np.stack([load_inference_image(p, 256)
                         for p in list_image_files(ref_d)])
        bank = eng.encode_styles(refs, d_idx)

        out_dir = os.path.join(args.out, "generated", name)
        os.makedirs(out_dir, exist_ok=True)

        def batches():
            for i in range(0, len(src_imgs), args.batch_size):
                chunk = src_imgs[i: i + args.batch_size]
                names = [os.path.basename(p) for p in src_files[i: i + args.batch_size]]
                yield chunk, names

        n_done = 0
        for out, names in eng.translate_batches(batches(), bank, "average"):
            u8 = np.clip((out + 1.0) * 127.5, 0, 255).astype(np.uint8)
            for img, nm in zip(u8, names):
                Image.fromarray(img).save(os.path.join(out_dir, nm))
                n_done += 1
        print(f"{name}: generated {n_done} images", flush=True)

        fid_gen = fid_between_dirs(out_dir, ref_d, image_size=256)
        fid_src = fid_between_dirs(args.source_dir, ref_d, image_size=256)
        # Weights-free second opinion (msig_tpu/eval/pixel_stats.py): the
        # proxy-FID above scores with RANDOM VGG features; these two use no
        # learned features at all, so an improvement confirmed by both is
        # not an artifact of the random extractor.
        cf_gen, tv_gen = pixel_metrics_between_dirs(out_dir, ref_d, 256)
        cf_src, tv_src = pixel_metrics_between_dirs(args.source_dir, ref_d, 256)
        report[name] = {
            "proxy_fid_generated_vs_ref": round(float(fid_gen), 6),
            "proxy_fid_source_vs_ref": round(float(fid_src), 6),
            "color_frechet_generated_vs_ref": round(float(cf_gen), 6),
            "color_frechet_source_vs_ref": round(float(cf_src), 6),
            "hist_tv_generated_vs_ref": round(float(tv_gen), 4),
            "hist_tv_source_vs_ref": round(float(tv_src), 4),
        }
        print(f"{name}: proxy-FID gen vs ref = {fid_gen:.6f}  "
              f"(source vs ref baseline = {fid_src:.6f})", flush=True)
        print(f"{name}: color-Frechet gen {cf_gen:.5f} vs src {cf_src:.5f}; "
              f"hist-TV gen {tv_gen:.4f} vs src {tv_src:.4f}", flush=True)

        # sample strip: source | generated for a few images
        if args.samples <= 0:
            continue
        strip = []
        for i in range(min(args.samples, len(src_imgs))):
            gen_img = np.asarray(Image.open(
                os.path.join(out_dir, os.path.basename(src_files[i]))))
            strip.append(np.concatenate([src_imgs[i], gen_img], axis=1))
        Image.fromarray(np.concatenate(strip, axis=0)).save(
            os.path.join(args.out, f"samples_{name}.jpg"), quality=92)

    with open(os.path.join(args.out, "quality.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
