"""Configuration: reference-parity constants + frozen dataclasses.

The module-level constants carry the same names and defaults as the reference's
flat config module (see /root/reference/config.py:1-67) so users can switch
frameworks without relearning knob names. The CLIs (main.py / inference.py)
use them as argparse defaults, exactly as the reference does
(/root/reference/main.py:104-131, /root/reference/inference.py:321-353).

On top of the flat constants, :class:`TrainConfig` / :class:`InferenceConfig`
are immutable dataclasses holding a fully-resolved configuration; training and
inference code only ever consumes these (no global mutable state — everything
under jit gets explicit arguments).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, Optional

# ---------------------------------------------------------------------------
# Reference-parity flat constants (names/defaults match reference config.py).
# ---------------------------------------------------------------------------

# Data paths
SOURCE_DIR = "./data/src/Tomato_Healthy"  # Single source domain
TARGET_DIR = "./data/ref2"  # Parent directory containing all target domains
GPU = 0  # kept for CLI-flag parity; selects nothing on TPU (all chips visible)
IMAGE_SIZE = 256

# Training settings
SAVE_DIR_BASE = "./results"
EXPERIMENT_NAME = "multidomain_exp"
NUM_EPOCHS = 200
BATCH_SIZE = 4
SAVE_FREQ = 100

N_RESIDUAL_BLOCKS = 8
STYLE_DIM = 256  # Style dimension

# Learning rates
LEARNING_RATE_G = 2e-4
LEARNING_RATE_D = 1e-4

# Loss weights
LOSS_WEIGHTS = {
    "gan": 1.0,
    "cycle": 10.0,  # Cycle consistency loss
    "identity": 5.0,  # Identity loss
    "content": 1.0,  # Content preservation (from VGG)
    "style": 1.0,  # Style matching (from VGG)
}

# Training options
TRAINING_USE_EMA = True
RESUME_CHECKPOINT = None

# Inference settings (reference config.py:42-56)
INFERENCE_INPUT_DIR = "./synthetic_target/Tomato_healthy"
INFERENCE_TARGET_DOMAINS_DIR = "./data/ref"
INFERENCE_CHECKPOINT_DIR = "./results/multidomain_exp/checkpoints/epoch_180"
INFERENCE_OUTPUT_DIR = "./output/multidomain_exp/interpolate"
INFERENCE_TARGET_DOMAIN = "Tomato_Bacterial_spot"
INFERENCE_USE_EMA = True
INFERENCE_STYLE_MODE = "interpolate"
INFERENCE_NOISE_LEVEL = 0.1

# ---------------------------------------------------------------------------
# Dead reference surface, kept ONLY for attribute parity (a user importing
# this module in place of the reference's config finds every name). None of
# these is read by the reference either (SURVEY.md §2.4): INFERENCE_USE_EMA
# is unconditional there (inference.py:46-53); the METRICS_*/VAE settings and
# INFERENCE_DOMAIN_ID/INFERENCE_STYLE_DIM are never referenced.
# ---------------------------------------------------------------------------
INFERENCE_DOMAIN_ID = 1
METRICS_INPUT_DIR = "./stylecyclegan/output/multi_domain_exp/interpolate"
METRICS_TARGET_DIR = "./experiments/plant_village_raw/train/Tomato_Bacterial_spot"
INFERENCE_VAE_CHECKPOINT = None
INFERENCE_VAE_LATENT_DIM = 16
INFERENCE_STYLE_DIM = 64

# EMA / loss-weight schedule constants (reference trainer.py:43,68)
EMA_BETA = 0.995
WARMUP_EPOCHS = 10
DECAY_EPOCHS = 100
GRAD_CLIP_NORM = 1.0
ADAM_B1 = 0.5
ADAM_B2 = 0.999
LR_ETA_MIN = 1e-6
CHECKPOINT_EVERY_EPOCHS = 10

# TPU-build-only knobs (no reference equivalent)
COMPUTE_DTYPE_TRAIN = "float32"  # conv compute dtype in the train step
COMPUTE_DTYPE_INFER = "bfloat16"  # conv compute dtype in the inference engine
INFERENCE_BATCH_SIZE = 64  # batched generation (reference loops 1-by-1)
# Fused Pallas instance-norm+modulation kernel (msig_tpu/ops/adain_pallas.py).
# Measured on TPU v5e (batch-128 256x256 generator forward): the pure-XLA path
# wins (1259 img/s vs 982) because XLA fuses the normalize+modulate chain into
# the surrounding convolutions, which an opaque pallas_call prevents — so the
# default is False; the kernel stays available (correct + VJP-tested) for
# platforms/shapes where the trade-off flips.
USE_PALLAS_ADAIN = False
VGG_WEIGHTS_PATH = None  # .npz produced by tools/convert_vgg_weights.py


def default_experiment_name(loss_weights: Dict[str, float]) -> str:
    """Auto experiment name from sorted loss weights.

    Parity with the reference's auto-naming (reference main.py:139-144):
    ``multi_domain_<key><value-with-dots-as-p>_...`` over sorted(weights).
    """
    parts = [f"{k}{str(v).replace('.', 'p')}" for k, v in sorted(loss_weights.items())]
    return "multi_domain_" + "_".join(parts)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Fully-resolved training configuration (immutable)."""

    source_dir: str = SOURCE_DIR
    target_dir: str = TARGET_DIR
    save_dir_base: str = SAVE_DIR_BASE
    resume: Optional[str] = RESUME_CHECKPOINT
    exp_name: Optional[str] = None
    gpu: int = GPU
    epochs: int = NUM_EPOCHS
    image_size: int = IMAGE_SIZE
    batch_size: int = BATCH_SIZE
    save_freq: int = SAVE_FREQ
    lr_g: float = LEARNING_RATE_G
    lr_d: float = LEARNING_RATE_D
    loss_weights: Dict[str, float] = dataclasses.field(
        default_factory=lambda: dict(LOSS_WEIGHTS)
    )
    use_ema: bool = TRAINING_USE_EMA
    wandb: bool = False
    style_dim: int = STYLE_DIM
    n_residual_blocks: int = N_RESIDUAL_BLOCKS
    ema_beta: float = EMA_BETA
    warmup_epochs: int = WARMUP_EPOCHS
    decay_epochs: int = DECAY_EPOCHS
    grad_clip_norm: float = GRAD_CLIP_NORM
    adam_b1: float = ADAM_B1
    adam_b2: float = ADAM_B2
    lr_eta_min: float = LR_ETA_MIN
    checkpoint_every: int = CHECKPOINT_EVERY_EPOCHS
    seed: int = 0
    compute_dtype: str = COMPUTE_DTYPE_TRAIN
    use_pallas: bool = USE_PALLAS_ADAIN
    vgg_weights_path: Optional[str] = VGG_WEIGHTS_PATH
    data_parallel: bool = True  # shard the batch over all local devices
    profile_steps: int = 0  # >0: trace N steps with jax.profiler, then exit
    # EXTENSION (not in reference): R1 gradient penalty weight; 0 = parity.
    r1_gamma: float = 0.0
    # Rematerialize generator forwards (jax.checkpoint) — enables 512x512
    # training within single-chip HBM at ~1/3 extra FLOPs.
    remat: bool = False
    # Device-resident dataset mode: upload the decoded dataset to HBM once
    # and run RandomResizedCrop+rot augmentation on device (TPU-native
    # extension; see msig_tpu/data/device_data.py).
    device_data: bool = False
    # Multi-host (DCN) training: call jax.distributed.initialize at startup.
    multihost: bool = False
    # EXTENSION (not in reference): style-reconstruction loss weight; 0 = parity.
    style_recon_weight: float = 0.0
    # EXTENSION (not in reference): diversity loss weight; 0 = parity.
    diversity_weight: float = 0.0
    # Explicit opt-in for training WITHOUT pretrained VGG19 weights (the
    # perceptual loss then uses the deterministic random feature extractor
    # in losses/vgg.py). The training CLI refuses to run without either
    # vgg_weights_path or this flag.
    allow_random_vgg: bool = False
    # wandb.watch parity (reference trainer.py:294): log per-tensor
    # gradient histograms every N steps (0 = off; reference uses 50).
    # Histograms are binned on device — see msig_tpu/train/watch.py.
    watch_freq: int = 0
    # Every N epochs, export a portable fp16 EMA (G_A2B + SE_B) snapshot
    # (the inference-loadable demo-npz layout) alongside full checkpoints.
    # ~34 MB vs ~350 MB for the full Orbax state — on a tunneled runtime a
    # full-state fetch is ~175 s, the snapshot ~17 s, so a dense quality
    # trajectory (eval every 50 epochs) stays affordable. 0 = off.
    ema_snapshot_every: int = 0

    @property
    def experiment_name(self) -> str:
        return self.exp_name or default_experiment_name(self.loss_weights)

    @staticmethod
    def parse_loss_weights(s: str) -> Dict[str, float]:
        """Loss weights arrive as a JSON string flag (reference main.py:124-125)."""
        return {str(k): float(v) for k, v in json.loads(s).items()}


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Fully-resolved inference configuration (immutable)."""

    input_dir: str = INFERENCE_INPUT_DIR
    ref_domains_dir: str = INFERENCE_TARGET_DOMAINS_DIR
    checkpoint_dir: str = INFERENCE_CHECKPOINT_DIR
    output_dir: str = INFERENCE_OUTPUT_DIR
    target_domain: str = INFERENCE_TARGET_DOMAIN
    gpu: int = GPU
    image_size: int = IMAGE_SIZE
    style_dim: int = STYLE_DIM
    style_mode: str = INFERENCE_STYLE_MODE
    noise_level: float = INFERENCE_NOISE_LEVEL
    max_styles: Optional[int] = None
    save_grid: bool = False
    batch_size: int = INFERENCE_BATCH_SIZE
    compute_dtype: str = COMPUTE_DTYPE_INFER
    use_pallas: bool = USE_PALLAS_ADAIN
    n_residual_blocks: int = N_RESIDUAL_BLOCKS
    seed: int = 0
    # EXTENSION (not in reference): latent-guided synthesis via MappingNetwork
    mapping_params: Optional[str] = None
    latent_dim: int = 16
    # Optional int8 quantized generator ('int8' | None). ~39 dB PSNR vs bf16.
    quantize: Optional[str] = None
    # Shard the serving batch over all local chips (params replicated,
    # batch split on a 1-D mesh). No-op on a single device.
    data_parallel: bool = False
