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


def honor_jax_platforms_env() -> None:
    """Re-assert an explicit ``JAX_PLATFORMS`` env choice in-process.

    This environment's sitecustomize registers the tunneled TPU PJRT
    plugin at interpreter start and force-selects
    ``jax_platforms="axon,cpu"`` via ``jax.config.update`` — which
    silently overrides a user's ``JAX_PLATFORMS=cpu``. That routes
    "CPU" CLI runs through the TPU tunnel, contending with any live
    training run. Calling this before the first backend use makes the
    env var authoritative again (no-op when unset)."""
    import os

    p = os.environ.get("JAX_PLATFORMS")
    if p:
        try:
            import jax

            jax.config.update("jax_platforms", p)
        except Exception as e:
            # Do NOT silently ignore: this function exists precisely so a
            # JAX_PLATFORMS=cpu run cannot sneak onto the tunneled TPU.
            import warnings

            warnings.warn(
                f"JAX_PLATFORMS={p!r} could not be applied ({e}); this "
                "process may run on a different backend than requested",
                RuntimeWarning,
                stacklevel=2,
            )


# Honor the env var for EVERY entry point that imports the package (CLIs,
# bench.py, the tools/ measurement harnesses) — before any of them touch a
# backend. The explicit calls in main.py/inference.py remain as belt and
# braces for import orders where jax is configured first.
honor_jax_platforms_env()


def enable_persistent_compile_cache(path: str | None = None) -> None:
    """Point jax at an on-disk compilation cache (big deal on this 1-core
    host: full-path compiles take minutes). The ``JAX_COMPILATION_CACHE_DIR``
    env var is not honored by this jax build, so set the config flags
    directly. Safe to call more than once; call before the first compile."""
    import os

    import jax

    d = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # read-only FS / unknown flags: cache is best-effort
        pass
