"""The single fused train step: G update + EMA + D update in one jit.

The reference runs ~14 eager forwards + 2 backwards per step across a
G-phase, an EMA pass and a D-phase (/root/reference/trainer.py:74-155).
Here the whole thing is ONE compiled XLA program:

  - fakes are computed once inside the G-loss closure and reused (via aux)
    for the D loss under ``stop_gradient`` — exactly reproducing torch's
    ``fake.detach()`` semantics where D trains on fakes from the
    *pre-update* generator (trainer.py:146-147);
  - the G loss differentiates jointly over {G_A2B, G_B2A, SE_A, SE_B}
    (one optimizer group, trainer.py:56-58) and the D loss over
    {D_A, D_B} (trainer.py:60-61), with grad-clip 1.0 before Adam;
  - EMA (beta=0.995) updates the four G/SE EMA copies right after the G
    update (trainer.py:131-134, utils.py:80-91);
  - learning rates and the 5 dynamic loss weights enter as scalar/vector
    array inputs, so per-epoch schedule changes never recompile.

Loss-term math matches trainer.py:91-153 term by term; see
tests/test_train_step.py for the parity checks.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from msig_tpu.losses import (
    l1_loss, lsgan_fake, lsgan_real, style_content_loss, style_content_loss_pair,
    style_content_loss_pair2,
)
from msig_tpu.train.schedule import WEIGHT_KEYS
from msig_tpu.train.state import Models, TrainState

Batch = Dict[str, jax.Array]


def prepare_images(x: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 [B,H,W,3] -> [-1,1] float; float inputs pass through (cast only)."""
    if x.dtype == jnp.uint8:
        return (x.astype(dtype) / 127.5) - 1.0
    return x.astype(dtype)


def make_train_step(
    models: Models,
    tx_g,
    tx_d,
    ema_beta: float,
    compute_dtype=jnp.float32,
    r1_gamma: float = 0.0,
    remat: bool | str = False,
    style_recon_weight: float = 0.0,
    diversity_weight: float = 0.0,
    batch_forwards: bool | None = None,
    vgg_pair: bool | str | None = None,  # True = 1x4B pair, "2x2" = 2x2B
    gram_dtype=jnp.float32,
    grad_hists: int = 0,
    n_devices: int = 1,
):
    """Build the fused step. Returns fn(state, batch, vgg_params, g_lr, d_lr, w).

    ``r1_gamma > 0`` adds an R1 gradient penalty on real images to the
    discriminator loss — an EXTENSION beyond the reference (which trains
    with plain LSGAN only, trainer.py:139-153); at the default 0.0 the loss
    surface is exactly the reference's.

    ``remat=True`` wraps the generator forwards in ``jax.checkpoint``
    (rematerialization): the G phase holds 5 generator activations at once
    (identity, two fakes, two cycles), which at 512x512 exceeds single-chip
    HBM — remat trades ~1/3 more FLOPs for activation memory.
    ``remat="cycle"`` rematerializes ONLY the cycle forwards (the
    activations with the longest liveness — they span the whole G phase),
    a cheaper memory/FLOPs trade for mid-size batches.

    ``style_recon_weight > 0`` adds a style-reconstruction loss (EXTENSION,
    StarGAN-v2-style): ``L1(SE_B(fake_B, y_trg), style_B)`` + the symmetric
    A-side term, encouraging the generator to actually carry the injected
    style. The reference has no such loss (SURVEY.md §6 caveat); 0 = parity.

    ``grad_hists > 0`` additionally returns per-tensor gradient histograms
    (``grad_hists`` bins each, computed on device — train/watch.py) under
    ``metrics["_grad_hists"]``: the wandb.watch equivalent (reference
    trainer.py:294). Compile this as a SECOND step variant and call it only
    on watch steps — the histograms cost VPU time and metrics-tree size.

    ``diversity_weight > 0`` adds a diversity-sensitive loss (EXTENSION):
    with a second same-domain reference image in the batch (``target2``,
    TrainLoader(second_target=True)), ``-L1(G(x, s1), G(x, s2))`` pushes
    distinct styles to produce distinct outputs. 0 = parity.
    """

    gen = models.generator
    se = models.style_encoder
    disc = models.discriminator

    gen_apply = jax.checkpoint(gen.apply) if remat is True else gen.apply
    # "cycle" (or True) remats the cycle forwards; False remats nothing.
    gen_apply_cyc = jax.checkpoint(gen.apply) if remat else gen.apply

    def train_step(
        state: TrainState,
        batch: Batch,
        vgg_params: Any,
        g_lr: jax.Array,
        d_lr: jax.Array,
        loss_weights: jax.Array,  # [5] in WEIGHT_KEYS order
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        real_A = prepare_images(batch["source"], compute_dtype)
        real_B = prepare_images(batch["target"], compute_dtype)
        bsz = real_A.shape[0]
        # Auto structure selection (trace-time, batch-size dependent):
        # the batched 2B generator forwards and the single-4B VGG forward
        # win at small batches but raise peak HBM liveness; at batch 32,
        # 256^2 the 4B VGG exceeds single-chip HBM (measured, docs/PERF.md).
        # The HBM-liveness constraint is PER CHIP: under a data-parallel
        # mesh the global batch is sharded, so the structure choice keys
        # off the per-device shard size (``n_devices`` from the trainer's
        # mesh), not the global batch.
        shard = bsz // max(1, n_devices)
        _bf = batch_forwards if batch_forwards is not None else shard <= 16
        _vp = vgg_pair if vgg_pair is not None else shard <= 16
        y_org = batch["source_domain"].astype(jnp.int32)
        y_trg = batch["target_domain"].astype(jnp.int32)
        disc_params = state.disc_params

        # ---------------- Generator phase ----------------
        # Forward-batching (math-preserving): every op in the generator,
        # discriminator and VGG is per-sample (convs, per-sample instance
        # norms, per-sample styles), so independent forwards through the
        # SAME network concatenate along batch into one launch. 5 B-sized
        # generator forwards become 3 launches (2B/2B/B), and the 6 VGG
        # forwards one 4B launch (style_content_loss_pair). Larger batches
        # tile the MXU better and cut per-launch overhead; loss values are
        # unchanged (tests/test_train_step.py).
        def g_loss_fn(gen_params):
            style_A = se.apply(gen_params["SE_A"], real_A, y_org)
            style_B = se.apply(gen_params["SE_B"], real_B, y_trg)

            if _bf:
                # G_A2B over (real_B -> identity, real_A -> fake_B), one launch
                id_fk = gen_apply(
                    gen_params["G_A2B"],
                    jnp.concatenate([real_B, real_A], axis=0),
                    jnp.concatenate([style_B, style_B], axis=0),
                )
                id_B, fake_B = jnp.split(id_fk, 2, axis=0)
                # G_B2A over (real_B -> fake_A, fake_B -> cyc_A), one launch
                fk_cy = gen_apply_cyc(
                    gen_params["G_B2A"],
                    jnp.concatenate([real_B, fake_B], axis=0),
                    jnp.concatenate([style_A, style_A], axis=0),
                )
                fake_A, cyc_A = jnp.split(fk_cy, 2, axis=0)
            else:
                id_B = gen_apply(gen_params["G_A2B"], real_B, style_B)
                fake_B = gen_apply(gen_params["G_A2B"], real_A, style_B)
                fake_A = gen_apply(gen_params["G_B2A"], real_B, style_A)
                cyc_A = gen_apply_cyc(gen_params["G_B2A"], fake_B, style_A)
            loss_identity = l1_loss(id_B, real_B)
            cyc_B = gen_apply_cyc(gen_params["G_A2B"], fake_A, style_B)

            loss_gan_A2B = lsgan_real(disc.apply(disc_params["D_B"], fake_B, y_trg))
            loss_gan_B2A = lsgan_real(disc.apply(disc_params["D_A"], fake_A, y_org))
            if _vp == "2x2":
                # Two 2B launches: the 4B dedup with ~half the liveness —
                # the b32 candidate structure (VERDICT r2 weak #2).
                (content_B, style_loss_B), (content_A, style_loss_A) = (
                    style_content_loss_pair2(vgg_params, fake_B, real_B,
                                             real_A, fake_A,
                                             gram_dtype=gram_dtype)
                )
            elif _vp:
                (content_B, style_loss_B), (content_A, style_loss_A) = (
                    style_content_loss_pair(vgg_params, fake_B, real_B, real_A,
                                            fake_A, gram_dtype=gram_dtype)
                )
            else:
                content_B, style_loss_B = style_content_loss(
                    vgg_params, fake_B, real_B, real_A, gram_dtype=gram_dtype)
                content_A, style_loss_A = style_content_loss(
                    vgg_params, fake_A, real_A, real_B, gram_dtype=gram_dtype)

            loss_gan = (loss_gan_A2B + loss_gan_B2A) / 2
            loss_style = (style_loss_A + style_loss_B) / 2
            loss_content = (content_A + content_B) / 2
            loss_cycle = (l1_loss(cyc_A, real_A) + l1_loss(cyc_B, real_B)) / 2

            individual = {
                "gan": loss_gan,
                "cycle": loss_cycle,
                "identity": loss_identity,
                "content": loss_content,
                "style": loss_style,
            }
            w = {k: loss_weights[i] for i, k in enumerate(WEIGHT_KEYS)}
            g_loss = sum(individual[k] * w[k] for k in WEIGHT_KEYS)
            if style_recon_weight > 0.0:
                recon_B = se.apply(gen_params["SE_B"], fake_B, y_trg)
                recon_A = se.apply(gen_params["SE_A"], fake_A, y_org)
                loss_style_recon = (
                    l1_loss(recon_B, style_B) + l1_loss(recon_A, style_A)
                ) / 2
                individual["style_recon"] = loss_style_recon
                g_loss = g_loss + style_recon_weight * loss_style_recon
            if diversity_weight > 0.0:
                real_B2 = prepare_images(batch["target2"], compute_dtype)
                style_B2 = se.apply(gen_params["SE_B"], real_B2, y_trg)
                fake_B2 = gen_apply(gen_params["G_A2B"], real_A, style_B2)
                loss_diversity = -l1_loss(fake_B2, fake_B)
                individual["diversity"] = loss_diversity
                g_loss = g_loss + diversity_weight * loss_diversity
            return g_loss, (individual, fake_A, fake_B)

        (g_loss, (individual, fake_A, fake_B)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.gen_params)

        g_updates, opt_g = tx_g.update(g_grads, state.opt_g, state.gen_params)
        g_updates = jax.tree.map(lambda u: -g_lr * u, g_updates)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        # ---------------- EMA (after G update, reference trainer.py:131-134) ---
        ema_params = jax.tree.map(
            lambda e, p: e * ema_beta + (1.0 - ema_beta) * p,
            state.ema_params,
            gen_params,
        )

        # ---------------- Discriminator phase ----------------
        fake_A_sg = jax.lax.stop_gradient(fake_A)
        fake_B_sg = jax.lax.stop_gradient(fake_B)

        def d_loss_fn(d_params):
            if _bf:
                # real+fake through each discriminator in one 2B launch
                pa = disc.apply(d_params["D_A"],
                                jnp.concatenate([real_A, fake_A_sg], axis=0),
                                jnp.concatenate([y_org, y_org], axis=0))
                pb = disc.apply(d_params["D_B"],
                                jnp.concatenate([real_B, fake_B_sg], axis=0),
                                jnp.concatenate([y_trg, y_trg], axis=0))
                pa_real, pa_fake = jnp.split(pa, 2, axis=0)
                pb_real, pb_fake = jnp.split(pb, 2, axis=0)
                loss_real_A = lsgan_real(pa_real)
                loss_real_B = lsgan_real(pb_real)
                loss_fake_A = lsgan_fake(pa_fake)
                loss_fake_B = lsgan_fake(pb_fake)
            else:
                loss_real_A = lsgan_real(disc.apply(d_params["D_A"], real_A, y_org))
                loss_real_B = lsgan_real(disc.apply(d_params["D_B"], real_B, y_trg))
                loss_fake_A = lsgan_fake(disc.apply(d_params["D_A"], fake_A_sg, y_org))
                loss_fake_B = lsgan_fake(disc.apply(d_params["D_B"], fake_B_sg, y_trg))
            d_loss = (loss_real_A + loss_fake_A + loss_real_B + loss_fake_B) / 2
            if r1_gamma > 0.0:
                from msig_tpu.extensions.r1 import r1_penalty

                d_loss = d_loss + (r1_gamma / 2.0) * (
                    r1_penalty(disc.apply, d_params["D_A"], real_A, y_org)
                    + r1_penalty(disc.apply, d_params["D_B"], real_B, y_trg)
                )
            return d_loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
        d_updates, opt_d = tx_d.update(d_grads, state.opt_d, state.disc_params)
        d_updates = jax.tree.map(lambda u: -d_lr * u, d_updates)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        new_state = TrainState(
            gen_params=gen_params,
            disc_params=disc_params,
            ema_params=ema_params,
            opt_g=opt_g,
            opt_d=opt_d,
            step=state.step + 1,
        )
        # Pre-clip global grad norms — the functional analogue of the
        # reference's wandb.watch gradient logging (trainer.py:292-294).
        metrics = {
            "D_loss": d_loss,
            "G_loss": g_loss,
            **individual,
            "g_grad_norm": optax.global_norm(g_grads),
            "d_grad_norm": optax.global_norm(d_grads),
        }
        if grad_hists:
            # Full wandb.watch parity: per-tensor gradient histograms,
            # binned on device (train/watch.py). Compiled only into the
            # watch-step variant the trainer invokes every watch_freq
            # steps — the hot step never pays for this.
            from msig_tpu.train.watch import gradient_histograms

            metrics["_grad_hists"] = gradient_histograms(
                g_grads, d_grads, bins=grad_hists
            )
        return new_state, metrics

    return train_step
