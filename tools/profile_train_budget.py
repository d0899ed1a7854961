#!/usr/bin/env python
"""Component-level time budget of the batch-32 256^2 train step.

Round-1/2 measured the fused step at ~756 ms but never published where the
time goes (VERDICT r2 weak #2). This tool times STAGED SUB-PROGRAMS, each
its own jit at the benched configuration (batch 32, 256^2, bf16 compute,
fp32 norms/Gram, 10 domains), and derives the budget:

  SE fwd            : 2 style-encoder forwards
  G 5-forwards      : the 5 generator forwards (incl. SE) of the G phase
  VGG+Gram fwd      : the 2 style_content_loss calls (6 B-sized VGG
                      forwards + 20 batch-coupled Gram matmuls)
  G fwd (loss)      : full g_loss_fn forward (G + SE + D-eval + VGG)
  G phase           : value_and_grad(g_loss) + clip + Adam + EMA
  D phase           : 4 D forwards + bwd + clip + Adam (fakes as inputs)
  full step         : the shipping fused step (baseline)

Timing fetches a scalar readback (block_until_ready lies on this
platform — docs/PERF.md). Run solo: the host has one CPU core.

Reference scope being budgeted: /root/reference/trainer.py:74-155.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax


def _enable_jax_cache():
    d = os.environ["JAX_COMPILATION_CACHE_DIR"]
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_enable_jax_cache()
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msig_tpu.config import TrainConfig
from msig_tpu.losses import init_vgg_params, l1_loss, lsgan_fake, lsgan_real, style_content_loss
from msig_tpu.train.schedule import WEIGHT_KEYS
from msig_tpu.train.state import Models, create_train_state, make_optimizers
from msig_tpu.train.step import make_train_step, prepare_images

B = int(os.environ.get("B", "32"))
SIZE = int(os.environ.get("SIZE", "256"))
ITERS = int(os.environ.get("ITERS", "5"))
# "float32" (reference parity) | "bfloat16" (fp32-accumulated bf16 Gram
# matmuls — the G phase's dominant fp32 MXU work, see ops/gram.py)
GRAM_DTYPE = os.environ.get("GRAM_DTYPE", "float32")
STAGES = os.environ.get("STAGES", "1") != "0"  # 0: only G phase + full step


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def timeit(fn, *args, iters=ITERS, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return 1000 * (time.perf_counter() - t0) / iters


def main():
    cfg = TrainConfig(image_size=SIZE, batch_size=B, compute_dtype="bfloat16")
    models = Models.from_config(cfg, num_domains=10, dtype=jnp.bfloat16)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    tx_g, tx_d = make_optimizers(cfg)
    vgg = init_vgg_params()

    rng = np.random.default_rng(0)
    real_A = jnp.asarray(rng.uniform(-1, 1, (B, SIZE, SIZE, 3)).astype(np.float32))
    real_B = jnp.asarray(rng.uniform(-1, 1, (B, SIZE, SIZE, 3)).astype(np.float32))
    y_org = jnp.zeros((B,), jnp.int32)
    y_trg = jnp.asarray(rng.integers(1, 10, (B,)), jnp.int32)
    batch = {"source": real_A, "target": real_B,
             "source_domain": y_org, "target_domain": y_trg}
    w_vec = jnp.ones((5,), jnp.float32)
    g_lr, d_lr = jnp.float32(2e-4), jnp.float32(1e-4)

    gen, se, disc = models.generator, models.style_encoder, models.discriminator
    dt = jnp.bfloat16
    gdt = jnp.bfloat16 if GRAM_DTYPE == "bfloat16" else jnp.float32
    print(f"gram_dtype = {GRAM_DTYPE}", flush=True)
    rA = prepare_images(real_A, dt)
    rB = prepare_images(real_B, dt)

    # ---- staged programs -------------------------------------------------
    @jax.jit
    def se_fwd(gp):
        sA = se.apply(gp["SE_A"], rA, y_org)
        sB = se.apply(gp["SE_B"], rB, y_trg)
        return sA.sum() + sB.sum()

    @jax.jit
    def g5_fwd(gp):
        sA = se.apply(gp["SE_A"], rA, y_org)
        sB = se.apply(gp["SE_B"], rB, y_trg)
        id_B = gen.apply(gp["G_A2B"], rB, sB)
        fake_B = gen.apply(gp["G_A2B"], rA, sB)
        fake_A = gen.apply(gp["G_B2A"], rB, sA)
        cyc_A = gen.apply(gp["G_B2A"], fake_B, sA)
        cyc_B = gen.apply(gp["G_A2B"], fake_A, sB)
        return (id_B.sum() + cyc_A.sum() + cyc_B.sum()).astype(jnp.float32)

    @jax.jit
    def vgg_fwd(vp, fake_B, fake_A):
        cB, sB = style_content_loss(vp, fake_B, rB, rA, gram_dtype=gdt)
        cA, sA = style_content_loss(vp, fake_A, rA, rB, gram_dtype=gdt)
        return cB + sB + cA + sA

    def g_loss_fn(gp, dp, vp):
        sA = se.apply(gp["SE_A"], rA, y_org)
        sB = se.apply(gp["SE_B"], rB, y_trg)
        id_B = gen.apply(gp["G_A2B"], rB, sB)
        fake_B = gen.apply(gp["G_A2B"], rA, sB)
        fake_A = gen.apply(gp["G_B2A"], rB, sA)
        cyc_A = gen.apply(gp["G_B2A"], fake_B, sA)
        cyc_B = gen.apply(gp["G_A2B"], fake_A, sB)
        loss_gan = (lsgan_real(disc.apply(dp["D_B"], fake_B, y_trg))
                    + lsgan_real(disc.apply(dp["D_A"], fake_A, y_org))) / 2
        cB, sLB = style_content_loss(vp, fake_B, rB, rA, gram_dtype=gdt)
        cA, sLA = style_content_loss(vp, fake_A, rA, rB, gram_dtype=gdt)
        loss = (loss_gan + l1_loss(id_B, rB)
                + (l1_loss(cyc_A, rA) + l1_loss(cyc_B, rB)) / 2
                + (cA + cB) / 2 + (sLA + sLB) / 2)
        return loss, (fake_A, fake_B)

    @jax.jit
    def g_fwd_loss(gp, dp, vp):
        loss, _ = g_loss_fn(gp, dp, vp)
        return loss

    @jax.jit
    def g_phase(st, vp):
        (loss, (fA, fB)), grads = jax.value_and_grad(
            lambda gp: g_loss_fn(gp, st.disc_params, vp), has_aux=True
        )(st.gen_params)
        upd, opt_g = tx_g.update(grads, st.opt_g, st.gen_params)
        upd = jax.tree.map(lambda u: -g_lr * u, upd)
        gp = optax.apply_updates(st.gen_params, upd)
        ema = jax.tree.map(lambda e, p: e * 0.995 + 0.005 * p, st.ema_params, gp)
        return loss, jax.tree.leaves(gp)[0].sum(), jax.tree.leaves(ema)[0].sum()

    @jax.jit
    def d_phase(st, fake_A, fake_B):
        def d_loss_fn(dp):
            return (lsgan_real(disc.apply(dp["D_A"], rA, y_org))
                    + lsgan_real(disc.apply(dp["D_B"], rB, y_trg))
                    + lsgan_fake(disc.apply(dp["D_A"], fake_A, y_org))
                    + lsgan_fake(disc.apply(dp["D_B"], fake_B, y_trg))) / 2
        d_loss, grads = jax.value_and_grad(d_loss_fn)(st.disc_params)
        upd, opt_d = tx_d.update(grads, st.opt_d, st.disc_params)
        upd = jax.tree.map(lambda u: -d_lr * u, upd)
        dp = optax.apply_updates(st.disc_params, upd)
        return d_loss, jax.tree.leaves(dp)[0].sum()

    full = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta, dt,
                                   gram_dtype=gdt))

    fB = gen.apply(state.gen_params["G_A2B"], rA,
                   se.apply(state.gen_params["SE_B"], rB, y_trg))
    fA = gen.apply(state.gen_params["G_B2A"], rB,
                   se.apply(state.gen_params["SE_A"], rA, y_org))
    _sync((fA, fB))

    rows = []

    def add(name, ms):
        rows.append((name, ms))
        print(f"{name:22s}: {ms:8.1f} ms", flush=True)

    if STAGES:
        add("SE fwd (x2)", timeit(se_fwd, state.gen_params))
        add("G 5-forwards (+SE)", timeit(g5_fwd, state.gen_params))
        add("VGG+Gram fwd (x2)", timeit(vgg_fwd, vgg, fB, fA))
        add("G fwd full loss", timeit(g_fwd_loss, state.gen_params,
                                      state.disc_params, vgg))
    gval = jax.device_get(g_fwd_loss(state.gen_params, state.disc_params, vgg))
    print(f"g_loss value ({GRAM_DTYPE} grams): {float(gval):.8f}", flush=True)
    add("G phase (grad+Adam)", timeit(g_phase, state, vgg))
    add("D phase (grad+Adam)", timeit(d_phase, state, fA, fB))
    add("FULL fused step", timeit(lambda s: full(s, batch, vgg, g_lr, d_lr, w_vec)[1],
                                  state))
    if not STAGES:
        return

    d = dict(rows)
    print("\n--- derived budget (ms) ---")
    print(f"SE forwards          : {d['SE fwd (x2)']:8.1f}")
    print(f"G forwards (5x gen)  : {d['G 5-forwards (+SE)'] - d['SE fwd (x2)']:8.1f}")
    print(f"VGG+Gram forward     : {d['VGG+Gram fwd (x2)']:8.1f}")
    print(f"D-eval in G loss     : {d['G fwd full loss'] - d['G 5-forwards (+SE)'] - d['VGG+Gram fwd (x2)']:8.1f}  (residual)")
    print(f"G backward+Adam+EMA  : {d['G phase (grad+Adam)'] - d['G fwd full loss']:8.1f}")
    print(f"D phase total        : {d['D phase (grad+Adam)']:8.1f}")
    print(f"G phase + D phase    : {d['G phase (grad+Adam)'] + d['D phase (grad+Adam)']:8.1f}"
          f"  vs full {d['FULL fused step']:8.1f}")


if __name__ == "__main__":
    main()
