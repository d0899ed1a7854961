#!/usr/bin/env python
"""Training CLI — flag-parity with the reference entry point.

Usage (same flags as /root/reference/main.py:100-147):

    python main.py --source_dir data/src/Tomato_healthy --target_dir data/ref \\
        [--epochs N] [--batch_size B] [--image_size S] [--lr_g F] [--lr_d F] \\
        [--loss_weights '{"gan":1.0,...}'] [--exp_name NAME] [--resume DIR] \\
        [--save_freq K] [--use_ema true] [--wandb] [--gpu N]

TPU-build extras: --compute_dtype, --vgg_weights, --seed, --no_data_parallel.
"""

import argparse
import json
import logging
import os
import sys

import msig_tpu.config as default_config
from msig_tpu.config import TrainConfig


def _parse_bool(s: str) -> bool:
    v = s.lower()
    if v in ("1", "true", "yes", "on"):
        return True
    if v in ("0", "false", "no", "off"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean (true/false), got {s!r}")


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Train Multi-Domain StyleCycleGAN (TPU-native) with custom configurations."
    )
    # --- Path Arguments ---
    parser.add_argument("--source_dir", type=str, default=default_config.SOURCE_DIR,
                        help="Path to source domain directory")
    parser.add_argument("--target_dir", type=str, default=default_config.TARGET_DIR,
                        help="Path to parent directory containing target domain subdirectories")
    parser.add_argument("--save_dir_base", type=str, default=default_config.SAVE_DIR_BASE,
                        help="Base directory for saving results")
    parser.add_argument("--resume", type=str, default=default_config.RESUME_CHECKPOINT,
                        help="Path to the checkpoint directory to resume training from")
    # --- Experiment Arguments ---
    parser.add_argument("--exp_name", type=str,
                        help="Experiment name. If not provided, it will be auto-generated.")
    parser.add_argument("--gpu", type=int, default=default_config.GPU,
                        help="Accepted for reference CLI parity; device selection is automatic on TPU.")
    # --- Training Hyperparameters ---
    parser.add_argument("--epochs", type=int, default=default_config.NUM_EPOCHS)
    parser.add_argument("--image_size", type=int, default=default_config.IMAGE_SIZE)
    parser.add_argument("--batch_size", type=int, default=default_config.BATCH_SIZE)
    parser.add_argument("--save_freq", type=int, default=default_config.SAVE_FREQ)
    parser.add_argument("--lr_g", type=float, default=default_config.LEARNING_RATE_G)
    parser.add_argument("--lr_d", type=float, default=default_config.LEARNING_RATE_D)
    parser.add_argument("--loss_weights", type=str,
                        default=json.dumps(default_config.LOSS_WEIGHTS),
                        help="Loss weights as a JSON string.")
    parser.add_argument("--use_ema", type=_parse_bool,
                        default=default_config.TRAINING_USE_EMA,
                        help="Use EMA models for saving samples during training. "
                             "(The reference's type=bool bug made EVERY string "
                             "truthy, main.py:126-127; here unknown values are "
                             "rejected instead of silently enabling EMA.)")
    # --- W&B Logging ---
    parser.add_argument("--wandb", action="store_true", help="Enable Weights & Biases logging.")
    # --- TPU-build extras ---
    parser.add_argument("--compute_dtype", type=str, default=default_config.COMPUTE_DTYPE_TRAIN,
                        choices=["float32", "bfloat16"])
    parser.add_argument("--vgg_weights", type=str, default=default_config.VGG_WEIGHTS_PATH,
                        help=".npz from tools/convert_vgg_weights.py (perceptual-loss weights)")
    parser.add_argument("--allow_random_vgg", action="store_true",
                        help="Explicitly allow training WITHOUT pretrained VGG19 weights "
                             "(perceptual loss uses a deterministic random feature extractor; "
                             "perceptual quality will NOT match the reference)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no_data_parallel", action="store_true",
                        help="Disable sharding the batch over local devices")
    parser.add_argument("--pallas", dest="pallas", action="store_true", default=None,
                        help="Force the fused Pallas AdaIN kernel ON (default: the "
                             "measured config default, config.USE_PALLAS_ADAIN)")
    parser.add_argument("--no_pallas", dest="pallas", action="store_false",
                        help="Force the fused Pallas AdaIN kernel OFF (use pure XLA)")
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="Trace N training steps with jax.profiler, then exit")
    parser.add_argument("--r1_gamma", type=float, default=0.0,
                        help="EXTENSION: R1 gradient-penalty weight (0 = reference parity)")
    parser.add_argument("--remat", action="store_true",
                        help="Rematerialize generator forwards (for 512x512 training)")
    parser.add_argument("--device_data", action="store_true",
                        help="Keep the decoded dataset HBM-resident and augment "
                             "on device (fastest when host->device bandwidth "
                             "limits the step)")
    parser.add_argument("--style_recon_weight", type=float, default=0.0,
                        help="EXTENSION: style-reconstruction loss weight (0 = parity)")
    parser.add_argument("--diversity_weight", type=float, default=0.0,
                        help="EXTENSION: diversity-sensitive loss weight (0 = parity)")
    parser.add_argument("--multihost", action="store_true",
                        help="Initialize jax.distributed for multi-host (DCN) training")
    parser.add_argument("--watch_freq", type=int, default=0,
                        help="With --wandb: log per-tensor gradient histograms "
                             "every N steps (wandb.watch equivalent; reference "
                             "uses 50). 0 disables.")
    parser.add_argument("--checkpoint_every", type=int,
                        default=default_config.CHECKPOINT_EVERY_EPOCHS,
                        help="Write a full train-state checkpoint every N epochs "
                             "(default %(default)s, the reference's hard-coded "
                             "cadence at trainer.py:355). On remote/tunneled "
                             "runtimes each write fetches the full state "
                             "device->host, so long runs may want a sparser "
                             "cadence. The final epoch always checkpoints.")
    parser.add_argument("--ema_snapshot_every", type=int, default=0,
                        help="Also export a ~34 MB portable fp16 EMA (G_A2B + "
                             "SE_B) snapshot every N epochs (inference-loadable "
                             "demo-npz layout) — cheap enough for a dense "
                             "quality trajectory on tunneled runtimes. "
                             "0 disables.")
    return parser


def config_from_args(args) -> TrainConfig:
    return TrainConfig(
        source_dir=args.source_dir,
        target_dir=args.target_dir,
        save_dir_base=args.save_dir_base,
        resume=args.resume,
        exp_name=args.exp_name,
        gpu=args.gpu,
        epochs=args.epochs,
        image_size=args.image_size,
        batch_size=args.batch_size,
        save_freq=args.save_freq,
        lr_g=args.lr_g,
        lr_d=args.lr_d,
        loss_weights=TrainConfig.parse_loss_weights(args.loss_weights),
        use_ema=args.use_ema,
        wandb=args.wandb,
        compute_dtype=args.compute_dtype,
        vgg_weights_path=args.vgg_weights,
        seed=args.seed,
        data_parallel=not args.no_data_parallel,
        use_pallas=(default_config.USE_PALLAS_ADAIN if args.pallas is None else args.pallas),
        profile_steps=args.profile_steps,
        r1_gamma=args.r1_gamma,
        remat=args.remat,
        device_data=args.device_data,
        multihost=args.multihost,
        style_recon_weight=args.style_recon_weight,
        diversity_weight=args.diversity_weight,
        allow_random_vgg=args.allow_random_vgg,
        watch_freq=args.watch_freq,
        checkpoint_every=args.checkpoint_every,
        ema_snapshot_every=args.ema_snapshot_every,
    )


def main(cfg: TrainConfig) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    import msig_tpu

    msig_tpu.honor_jax_platforms_env()
    msig_tpu.enable_persistent_compile_cache()
    from msig_tpu.data import MultiDomainDataset
    from msig_tpu.train.trainer import Trainer

    if getattr(cfg, "multihost", False):
        from msig_tpu.parallel import initialize_multihost

        initialize_multihost()

    print(f"--- Starting Multi-Domain Experiment: {cfg.experiment_name} ---")

    for path, what in ((cfg.source_dir, "Source"), (cfg.target_dir, "Target domains")):
        if not os.path.exists(path):
            print(f"ERROR: {what} directory not found: {path}")
            return 1

    # Refuse to silently train with the random-VGG fallback: the reference
    # loads ImageNet VGG19 (/root/reference/losses.py:15) and perceptual
    # quality depends on it. Training without pretrained weights must be an
    # explicit, visible decision.
    if not cfg.vgg_weights_path and not getattr(cfg, "allow_random_vgg", False):
        print(
            "ERROR: no pretrained VGG19 weights (--vgg_weights FILE.npz). The "
            "perceptual style/content loss would fall back to a RANDOM feature "
            "extractor, which does not match the reference's ImageNet-VGG19 "
            "loss. Convert weights with tools/convert_vgg_weights.py, or pass "
            "--allow_random_vgg to proceed anyway."
        )
        return 1
    if cfg.vgg_weights_path and not os.path.exists(cfg.vgg_weights_path):
        print(f"ERROR: --vgg_weights file not found: {cfg.vgg_weights_path}")
        return 1

    # wandb starts only after input validation: the early-error returns above
    # exit without a finish(), which would leave an empty run to be closed by
    # wandb's atexit handler (recorded as crashed). Reference inits first
    # (main.py:20-27) but has no validated early exits to worry about.
    wandb_run = None
    if cfg.wandb:
        import wandb

        wandb_run = wandb.init(
            project="Multi-Domain Style-Injected CycleGAN",
            name=cfg.experiment_name,
            config={k: v for k, v in vars(cfg).items()},
        )

    dataset = MultiDomainDataset.build(cfg.source_dir, cfg.target_dir)
    print(f"Found {len(dataset.source_files)} source images")
    print("\n" + "=" * 60)
    print("MULTI-DOMAIN DATASET STATISTICS")
    print("=" * 60)
    print(f"Total domains: {dataset.num_domains}")
    print(f"Source domain: {dataset.domains[0]} (index 0)")
    print(f"Target domains: {dataset.num_target_domains}")
    for i, name in enumerate(dataset.domains):
        n = (len(dataset.source_files) if i == 0
             else len(dataset.target_files_by_domain[name]))
        print(f"  • Domain {i}: {name} - {n} images")
    print("=" * 60 + "\n")

    trainer = Trainer(cfg, dataset, wandb_run=wandb_run)

    if getattr(cfg, "profile_steps", 0):
        try:
            trace_dir = trainer.profile_steps(cfg.profile_steps)
        finally:
            if wandb_run is not None:
                wandb_run.finish()
        print(f"Profiler trace written to {trace_dir}")
        return 0

    start_epoch = 0
    if cfg.resume:
        print(f"Attempting to resume from checkpoint: {cfg.resume}")
        start_epoch = trainer.resume(cfg.resume)
        print(f"Resuming training from epoch {start_epoch + 1}")

    print("Starting multi-domain training...")
    try:
        trainer.train(start_epoch=start_epoch)
    except Exception as e:
        print(f"An error occurred during training: {e}")
        import traceback

        traceback.print_exc()
        return 1
    finally:
        if wandb_run is not None:
            wandb_run.finish()

    print(f"--- Multi-Domain Experiment {cfg.experiment_name} Completed ---")
    return 0


if __name__ == "__main__":
    sys.exit(main(config_from_args(build_arg_parser().parse_args())))
