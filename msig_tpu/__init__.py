"""msig_tpu — TPU-native Multi-Domain Style-Injected GAN framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
``chouyunming/Multi-Domain-Style-Injected-GAN`` (reference layout documented in
SURVEY.md): unpaired one-source → N-target-domain image translation with a
StyleCycleGAN generator whose decoder injects per-domain style codes through
AdaIN residual blocks, trained with LSGAN + cycle + identity + VGG19 perceptual
style/content losses, dynamic loss-weight scheduling, EMA generators,
checkpoint/resume, and a reference-guided batched inference engine.

Layout (TPU-first, not a port):
  - ``models/``   flax.linen networks in NHWC layout (MXU-native convs)
  - ``ops/``      low-level compute ops: fused AdaIN (Pallas + XLA paths),
                  Gram matrices, image preprocessing ops
  - ``losses/``   LSGAN / L1 criteria and the VGG19 perceptual loss
  - ``data/``     host-side dataset discovery + async pipeline feeding HBM
  - ``train/``    single fused jit train step, schedules, trainer, checkpoints
  - ``infer/``    batched jit inference engine + style sampling modes
  - ``parallel/`` device mesh + data-parallel sharding over ICI/DCN
  - ``utils/``    EMA math, sample grids, plotting
"""

__version__ = "0.1.0"
