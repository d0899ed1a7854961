#!/usr/bin/env python
"""Inference CLI — flag-parity with the reference entry point.

Usage (same flags as /root/reference/inference.py:317-355, plus --batch_size):

    python inference.py --input_dir IN --ref_domains_dir REF \\
        --checkpoint_dir CKPT --output_dir OUT --target_domain NAME \\
        [--style_mode average|random|interpolate|noise|specific] \\
        [--noise_level F] [--max_styles N] [--image_size S] [--style_dim D] \\
        [--batch_size B] [--save_grid] [--gpu N]

Behavior parity: domain discovery identical to training (sorted subdirs,
source=0), EMA-preferred checkpoint loading with raw fallback, per-image
output files named after the inputs, exit code 0 iff at least one image was
processed, quiet mode when stdout is redirected.
"""

import argparse
import logging
import os
import sys

import msig_tpu.config as default_config
from msig_tpu.config import InferenceConfig


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Multi-domain inference with style sampling")
    # Paths
    parser.add_argument("--input_dir", type=str, default=default_config.INFERENCE_INPUT_DIR,
                        help="Directory containing source images")
    parser.add_argument("--ref_domains_dir", type=str,
                        default=default_config.INFERENCE_TARGET_DOMAINS_DIR,
                        help="Directory containing all reference domain folders")
    parser.add_argument("--checkpoint_dir", type=str,
                        default=default_config.INFERENCE_CHECKPOINT_DIR,
                        help="Directory containing model checkpoint")
    parser.add_argument("--output_dir", type=str, default=default_config.INFERENCE_OUTPUT_DIR,
                        help="Directory to save output images")
    # Domain selection
    parser.add_argument("--target_domain", type=str,
                        default=default_config.INFERENCE_TARGET_DOMAIN,
                        help="Target domain folder to translate to; also "
                             "accepts a comma-separated list or 'all' "
                             "(multi-domain outputs go to output_dir/<domain>/)")
    # Model parameters
    parser.add_argument("--gpu", type=int, default=default_config.GPU,
                        help="Accepted for reference CLI parity; device selection is automatic on TPU")
    parser.add_argument("--image_size", type=int, default=default_config.IMAGE_SIZE)
    parser.add_argument("--style_dim", type=int, default=default_config.STYLE_DIM,
                        help="Dimension of style code")
    # Style sampling
    parser.add_argument("--style_mode", type=str, default=default_config.INFERENCE_STYLE_MODE,
                        choices=["average", "random", "interpolate", "noise", "specific",
                                 "latent"],
                        help="Style sampling mode ('latent' is an extension and needs "
                             "--mapping_params)")
    parser.add_argument("--mapping_params", type=str, default=None,
                        help="EXTENSION: flax-serialized MappingNetwork params for "
                             "latent-guided synthesis (style_mode=latent)")
    parser.add_argument("--latent_dim", type=int, default=16,
                        help="EXTENSION: latent z dimension for style_mode=latent")
    parser.add_argument("--noise_level", type=float,
                        default=default_config.INFERENCE_NOISE_LEVEL,
                        help="Noise level for noise mode")
    parser.add_argument("--max_styles", type=int, default=None,
                        help="Maximum number of style vectors to load (None for all)")
    # Options
    parser.add_argument("--save_grid", action="store_true",
                        help="Save comparison grid of different style modes")
    # TPU-build extras
    parser.add_argument("--batch_size", type=int, default=default_config.INFERENCE_BATCH_SIZE,
                        help="Generation batch size (the reference loops 1-by-1)")
    parser.add_argument("--compute_dtype", type=str, default=default_config.COMPUTE_DTYPE_INFER,
                        choices=["float32", "bfloat16"])
    parser.add_argument("--quantize", type=str, default=None, choices=["int8"],
                        help="Quantized generator for serving (~39 dB PSNR vs bf16)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--pallas", dest="pallas", action="store_true", default=None,
                        help="Force the fused Pallas AdaIN kernel ON (default: "
                             "config.USE_PALLAS_ADAIN)")
    parser.add_argument("--no_pallas", dest="pallas", action="store_false")
    parser.add_argument("--data_parallel", action="store_true",
                        help="Shard the serving batch over all local chips "
                             "(no-op on a single device)")
    return parser


def config_from_args(args) -> InferenceConfig:
    return InferenceConfig(
        input_dir=args.input_dir,
        ref_domains_dir=args.ref_domains_dir,
        checkpoint_dir=args.checkpoint_dir,
        output_dir=args.output_dir,
        target_domain=args.target_domain,
        gpu=args.gpu,
        image_size=args.image_size,
        style_dim=args.style_dim,
        style_mode=args.style_mode,
        noise_level=args.noise_level,
        max_styles=args.max_styles,
        save_grid=args.save_grid,
        batch_size=args.batch_size,
        compute_dtype=args.compute_dtype,
        seed=args.seed,
        use_pallas=(default_config.USE_PALLAS_ADAIN if args.pallas is None else args.pallas),
        mapping_params=args.mapping_params,
        latent_dim=args.latent_dim,
        quantize=args.quantize,
        data_parallel=args.data_parallel,
    )


def main(cfg: InferenceConfig) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    import msig_tpu

    msig_tpu.honor_jax_platforms_env()
    is_redirected = not os.isatty(1)  # quiet when stdout is redirected

    def say(msg):
        if not is_redirected:
            print(msg)

    say(f"Starting inference with target domain: {cfg.target_domain}")
    say(f"Input directory: {cfg.input_dir}")
    say(f"Reference domains directory: {cfg.ref_domains_dir}")
    say(f"Checkpoint directory: {cfg.checkpoint_dir}")
    say(f"Output directory: {cfg.output_dir}")

    from msig_tpu.data import discover_inference_domains
    from msig_tpu.infer import InferenceEngine
    from msig_tpu.infer.loading import load_inference_params
    from msig_tpu.utils import save_image, save_sample_grid

    # Discover domains (source is 0, targets from 1 — must match training)
    try:
        domain_dirs = discover_inference_domains(cfg.ref_domains_dir)
    except ValueError as e:
        print(f"Failed to discover domains: {e}")
        return 1
    if not domain_dirs:
        raise ValueError(f"No domains found in {cfg.ref_domains_dir}")
    num_domains = len(domain_dirs) + 1
    say(f"Found {len(domain_dirs)} target domains: {domain_dirs}")

    # EXTENSION (not in the reference, which is one domain per process):
    # --target_domain accepts a comma-separated list or 'all'. Multi-domain
    # runs reuse the one compiled generator (the style bank is a plain
    # argument, so swapping domains costs zero recompiles) and write each
    # domain under output_dir/<domain>/. A single domain keeps the
    # reference's flat output layout.
    if cfg.target_domain == "all":
        targets = list(domain_dirs)
    else:
        targets = [d.strip() for d in cfg.target_domain.split(",") if d.strip()]
    # Same UX as every other user-input failure: message + exit 1, no
    # traceback (the reference tracebacks here; a clean error is a superset).
    if not targets:
        print(f"Failed: --target_domain {cfg.target_domain!r} names no domain. "
              f"Available: {domain_dirs}")
        return 1
    for t in targets:
        if t not in domain_dirs:
            print(f"Failed: target domain '{t}' not found. Available: {domain_dirs}")
            return 1
    target_idx = domain_dirs.index(targets[0]) + 1
    say(f"Target domain(s): {targets} (first index: {target_idx})")

    # Load model (EMA preferred, raw fallback)
    try:
        gen_params, se_params, meta, used_ema = load_inference_params(
            cfg.checkpoint_dir, cfg, num_domains
        )
        say(f"Model loaded successfully ({'EMA' if used_ema else 'raw'} weights)")
    except Exception as e:
        print(f"Failed to load model: {e}")
        import traceback

        traceback.print_exc()
        return 1

    engine = InferenceEngine.build(
        cfg,
        num_domains,
        gen_params,
        se_params,
        n_residual_blocks=meta.get("n_residual_blocks"),
        style_dim=meta.get("style_dim"),
    )

    # Style source: per-domain reference bank, or (extension) mapping network
    map_ctx = None
    if cfg.style_mode == "latent":
        if not cfg.mapping_params:
            raise ValueError("style_mode='latent' requires --mapping_params")
        import jax
        import jax.numpy as jnp

        import msig_tpu

        msig_tpu.enable_persistent_compile_cache()
        from flax import serialization

        from msig_tpu.extensions import MappingNetwork

        map_mod = MappingNetwork(
            latent_dim=cfg.latent_dim,
            style_dim=int(meta.get("style_dim", cfg.style_dim)),
            num_domains=num_domains,
        )
        template = map_mod.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.latent_dim)),
            jnp.zeros((1,), jnp.int32),
        )
        with open(cfg.mapping_params, "rb") as f:
            map_params = serialization.from_bytes(template, f.read())
        map_ctx = (map_mod, map_params)
        say("Mapping network loaded (latent-guided synthesis)")

    os.makedirs(cfg.output_dir, exist_ok=True)

    # Serving engine: convert [-1,1] -> uint8 ON DEVICE (4x less
    # device->host traffic; the int8 path fuses the conversion into its
    # final Pallas kernel) and JPEG-encode on a thread pool so disk I/O
    # overlaps the next batch's device compute. The --save_grid pass below
    # keeps using the float-output `engine` (separate jit cache).
    import dataclasses as _dc
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor as _Pool

    serving = _dc.replace(engine, out_uint8=True)

    processed, failed = 0, 0

    def run_domain(domain: str, out_dir: str) -> int:
        """Translate every input into ``domain``; returns 1 on a fatal error.

        All compiled programs are shared across domains: the style bank and
        domain index are plain arguments of the jitted generate/encode fns.
        """
        nonlocal processed, failed
        t_idx = domain_dirs.index(domain) + 1
        mapping = None
        bank = None
        if map_ctx is not None:
            mapping = (map_ctx[0], map_ctx[1], cfg.latent_dim, t_idx)
        else:
            try:
                bank = engine.preload_style_bank(
                    os.path.join(cfg.ref_domains_dir, domain),
                    t_idx,
                    max_styles=cfg.max_styles,
                    seed=cfg.seed,
                )
                say(f"[{domain}] Style vectors loaded successfully ({bank.shape[0]})")
            except Exception as e:
                print(f"Failed to load style vectors: {e}")
                import traceback

                traceback.print_exc()
                return 1

        os.makedirs(out_dir, exist_ok=True)

        # --save_grid: comparison grid of all style modes for the first
        # input. (The reference parses this flag but never implements it,
        # reference inference.py:352-353 — here it works.)
        if cfg.save_grid and bank is not None:
            grid_it = engine.iter_input_batches(cfg.input_dir)
            first = next(grid_it, None)
            grid_it.close()  # stop the producer thread (only 1 batch needed)
            if first is not None:
                import numpy as np

                from msig_tpu.infer.styles import STYLE_MODES

                imgs, names = first
                # Host copy: with --data_parallel the batch is a committed
                # mesh-sharded array and a device-side slice would carry a
                # replicated sharding that the engine's jit in_shardings
                # reject; a numpy array re-enters the normal staging path.
                one = np.asarray(imgs[0:1])
                tiles = [np.asarray(one[0], "float32") / 127.5 - 1.0]
                labels = ["input"]
                for mode in STYLE_MODES:
                    out, _ = next(
                        engine.translate_batches(
                            iter([(one.copy(), names[:1])]), bank, mode,
                            cfg.noise_level, cfg.seed,
                        )
                    )
                    tiles.append(out[0])
                    labels.append(mode)
                grid_path = os.path.join(out_dir, "style_modes_grid.png")
                save_sample_grid(np.stack(tiles), grid_path, nrow=3,
                                 domain_names=labels)
                say(f"Saved style-mode comparison grid to {grid_path}")

        # Multi-domain: decode the input set ONCE and replay the host-side
        # cache for the remaining domains (translate only swaps the style
        # bank; N decode passes on a single-core host would dominate e2e).
        # The cache is only kept when the whole set fits under a size cap.
        if decode_cache is not None and decode_cache.get("ready"):
            batches = serving.iter_host_batches(decode_cache["batches"])
        elif decode_cache is not None:
            decode_cache["batches"] = []
            batches = serving.iter_input_batches(
                cfg.input_dir, host_tee=decode_cache["batches"]
            )
        else:
            batches = serving.iter_input_batches(cfg.input_dir)
        say(f"[{domain}] Processing images with style mode: {cfg.style_mode}")

        def _save(img, name):
            try:
                save_image(img, os.path.join(out_dir, name))
                return True
            except Exception as e:
                print(f"Error processing {name}: {e}")
                return False

        pending: deque = deque()

        def _drain(limit):
            nonlocal processed, failed
            while len(pending) > limit:
                if pending.popleft().result():
                    processed += 1
                else:
                    failed += 1

        with _Pool(4) as pool:
            for out, names in serving.translate_batches(
                batches, bank, cfg.style_mode, cfg.noise_level, cfg.seed,
                mapping=mapping,
            ):
                for img, name in zip(out, names):
                    pending.append(pool.submit(_save, img, name))
                # Bound the in-flight queue (translated uint8 images).
                _drain(4 * serving.batch_size)
            _drain(0)
        if decode_cache is not None and not decode_cache.get("ready"):
            decode_cache["ready"] = True  # first pass completed the full set
        return 0

    multi = len(targets) > 1
    decode_cache = None
    if multi:
        from msig_tpu.data import list_image_files as _lif

        n_inputs = len(_lif(cfg.input_dir))
        est_bytes = n_inputs * cfg.image_size * cfg.image_size * 3
        try:
            cap_mb = int(os.environ.get("MSIG_DECODE_CACHE_MB", "2048"))
        except ValueError:
            print("WARNING: MSIG_DECODE_CACHE_MB is not an integer; using 2048")
            cap_mb = 2048
        cap = cap_mb * (1 << 20)
        if est_bytes <= cap:
            decode_cache = {"ready": False, "batches": []}
        else:
            say(f"Decode cache disabled ({est_bytes >> 20} MB uint8 exceeds "
                f"MSIG_DECODE_CACHE_MB={cap >> 20}); re-decoding per domain")
    for t in targets:
        rc = run_domain(t, os.path.join(cfg.output_dir, t) if multi else cfg.output_dir)
        if rc:
            return rc

    if processed == 0:
        if failed:
            print(f"WARNING: all {failed} images failed (decode or save errors above)")
        else:
            print(f"WARNING: No images found in {cfg.input_dir}")
        return 1

    say("\nInference complete!")
    say(f"Successfully processed: {processed} images"
        + (f" across {len(targets)} domains" if multi else ""))
    say(f"Failed: {failed} images")
    say(f"Results saved to: {cfg.output_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main(config_from_args(build_arg_parser().parse_args())))
