"""Torch-checkpoint EXPORT parity: our params -> reference-format state_dicts.

The mirror image of tests/test_torch_import.py: takes randomly-initialized
msig_tpu networks, exports them through msig_tpu.compat.torch_export, and
verifies (a) the functional torch forward on the exported state_dict matches
our forward (so the reference's own code would produce the same images from
an exported checkpoint), (b) export∘import and import∘export round-trip
bitwise, and (c) the written ``checkpoint.pth`` carries optimizer/scheduler
states a real ``torch.optim.Adam``/``CosineAnnealingLR`` can load and step —
i.e. the reference's ``--resume`` works on our exports
(/root/reference/trainer.py:176-207).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from msig_tpu.compat import (
    export_discriminator,
    export_generator,
    export_style_encoder,
    import_discriminator,
    import_generator,
    import_style_encoder,
    load_torch_checkpoint_dir,
    save_torch_checkpoint_dir,
)
from msig_tpu.models import (
    MultiDomainDiscriminator,
    MultiDomainStyleEncoder,
    StyleCycleGANGenerator,
)
from tests.test_torch_import import (
    N_RES,
    NDOM,
    SDIM,
    _nhwc,
    make_disc_sd,
    make_gen_sd,
    make_se_sd,
    t_disc_forward,
    t_gen_forward,
    t_se_forward,
)


def _flat(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat(v, prefix + (k,))
    else:
        yield "/".join(prefix), np.asarray(tree)


def _assert_trees_equal(a, b):
    fa, fb = dict(_flat(a)), dict(_flat(b))
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


class TestRoundTrip:
    """export(import(sd)) == sd and import(export(params)) == params, bitwise."""

    def test_generator(self):
        sd = {k: v.numpy() for k, v in make_gen_sd().items()}
        out = export_generator(import_generator(sd, N_RES), N_RES)
        assert set(out) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(out[k], sd[k], err_msg=k)

    def test_style_encoder(self):
        sd = {k: v.numpy() for k, v in make_se_sd().items()}
        out = export_style_encoder(import_style_encoder(sd, NDOM, SDIM), NDOM, SDIM)
        assert set(out) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(out[k], sd[k], err_msg=k)

    def test_discriminator(self):
        sd = {k: v.numpy() for k, v in make_disc_sd().items()}
        out = export_discriminator(import_discriminator(sd, NDOM), NDOM)
        assert set(out) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(out[k], sd[k], err_msg=k)

    def test_params_roundtrip(self):
        mod = StyleCycleGANGenerator(style_dim=SDIM, n_residual_blocks=N_RES)
        params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, SDIM)))
        back = import_generator(export_generator(params, N_RES), N_RES)
        _assert_trees_equal(jax.device_get(params), back)


class TestExportForwardParity:
    """The reference's (functional-torch) forward on exported weights == ours."""

    def test_generator(self):
        mod = StyleCycleGANGenerator(style_dim=SDIM, n_residual_blocks=N_RES)
        x = torch.randn(2, 3, 32, 32)
        style = torch.randn(2, SDIM)
        params = mod.init(jax.random.PRNGKey(1), _nhwc(x), jnp.asarray(style.numpy()))
        ours = np.asarray(mod.apply(params, _nhwc(x), jnp.asarray(style.numpy())))
        sd = {k: torch.from_numpy(v) for k, v in export_generator(jax.device_get(params), N_RES).items()}
        theirs = t_gen_forward(sd, x, style).numpy()
        np.testing.assert_allclose(ours, np.transpose(theirs, (0, 2, 3, 1)), rtol=1e-3, atol=1e-4)

    def test_style_encoder(self):
        mod = MultiDomainStyleEncoder(style_dim=SDIM, num_domains=NDOM)
        x = torch.randn(2, 3, 32, 32)
        idx = torch.tensor([1, 2])
        params = mod.init(jax.random.PRNGKey(2), _nhwc(x), jnp.asarray(idx.numpy()))
        ours = np.asarray(mod.apply(params, _nhwc(x), jnp.asarray(idx.numpy())))
        sd = {k: torch.from_numpy(v)
              for k, v in export_style_encoder(jax.device_get(params), NDOM, SDIM).items()}
        theirs = t_se_forward(sd, x, idx).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-5)

    def test_discriminator(self):
        mod = MultiDomainDiscriminator(num_domains=NDOM)
        x = torch.randn(2, 3, 64, 64)
        idx = torch.tensor([0, 2])
        params = mod.init(jax.random.PRNGKey(3), _nhwc(x), jnp.asarray(idx.numpy()))
        ours = np.asarray(mod.apply(params, _nhwc(x), jnp.asarray(idx.numpy())))
        sd = {k: torch.from_numpy(v)
              for k, v in export_discriminator(jax.device_get(params), NDOM).items()}
        theirs = t_disc_forward(sd, x, idx).numpy()
        np.testing.assert_allclose(ours, np.transpose(theirs, (0, 2, 3, 1)), rtol=1e-3, atol=1e-4)


def _tiny_param_sets():
    gen_sd = {"G_A2B": make_gen_sd(), "G_B2A": make_gen_sd(),
              "SE_A": make_se_sd(), "SE_B": make_se_sd()}
    disc_sd = {"D_A": make_disc_sd(), "D_B": make_disc_sd()}
    gen_params = {
        "G_A2B": import_generator({k: v.numpy() for k, v in gen_sd["G_A2B"].items()}, N_RES),
        "G_B2A": import_generator({k: v.numpy() for k, v in gen_sd["G_B2A"].items()}, N_RES),
        "SE_A": import_style_encoder({k: v.numpy() for k, v in gen_sd["SE_A"].items()}, NDOM, SDIM),
        "SE_B": import_style_encoder({k: v.numpy() for k, v in gen_sd["SE_B"].items()}, NDOM, SDIM),
    }
    disc_params = {
        "D_A": import_discriminator({k: v.numpy() for k, v in disc_sd["D_A"].items()}, NDOM),
        "D_B": import_discriminator({k: v.numpy() for k, v in disc_sd["D_B"].items()}, NDOM),
    }
    return gen_params, disc_params


class TestCheckpointDir:
    def test_save_load_dir_roundtrip(self, tmp_path):
        gen_params, disc_params = _tiny_param_sets()
        out = tmp_path / "export"
        save_torch_checkpoint_dir(
            str(out), gen_params, disc_params, ema_params=gen_params,
            num_domains=NDOM, style_dim=SDIM, n_residual_blocks=N_RES,
            loss_history={"G_loss": [1.0, 0.9], "D_loss": [0.5, 0.4]},
        )
        assert (out / "checkpoint.pth").exists() and (out / "ema_checkpoint.pth").exists()
        gen2, disc2, ema2 = load_torch_checkpoint_dir(str(out), NDOM, SDIM, N_RES)
        _assert_trees_equal(gen_params, gen2)
        _assert_trees_equal(disc_params, disc2)
        _assert_trees_equal(gen_params, ema2)

    def test_reference_resume_semantics(self, tmp_path):
        """The pickle carries everything /root/reference/trainer.py:176-207 reads,
        and the synthesized optimizer/scheduler states load into REAL torch
        objects and survive a step (so the reference can keep training)."""
        gen_params, disc_params = _tiny_param_sets()
        out = tmp_path / "export"
        history = {"G_loss": [1.0, 0.9, 0.8], "D_loss": [0.5, 0.4, 0.3]}
        save_torch_checkpoint_dir(
            str(out), gen_params, disc_params, num_domains=NDOM, style_dim=SDIM,
            n_residual_blocks=N_RES, loss_history=history, total_epochs=20,
        )
        ckpt = torch.load(out / "checkpoint.pth", map_location="cpu", weights_only=False)
        assert ckpt["num_domains"] == NDOM
        # start_epoch derivation (trainer.py:206-207)
        assert len(ckpt["loss_history"]["G_loss"]) == 3

        for opt_key, sched_key, lr in (("g_optimizer", "g_scheduler", 2e-4),
                                       ("d_optimizer", "d_scheduler", 1e-4)):
            n = len(ckpt[opt_key]["param_groups"][0]["params"])
            params = [torch.zeros(2, requires_grad=True) for _ in range(n)]
            opt = torch.optim.Adam(params, lr=lr, betas=(0.5, 0.999))
            opt.load_state_dict(ckpt[opt_key])
            sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=20, eta_min=1e-6)
            sched.load_state_dict(ckpt[sched_key])
            assert sched.last_epoch == 3
            sum(p.sum() for p in params).backward()
            opt.step()  # would KeyError if any Adam group hyperparameter were missing
            sched.step()
            assert sched.last_epoch == 4

        # param counts match the reference's group construction order
        n_g = sum(len(ckpt[k]) for k in ("G_A2B", "G_B2A", "SE_A", "SE_B"))
        n_d = sum(len(ckpt[k]) for k in ("D_A", "D_B"))
        assert len(ckpt["g_optimizer"]["param_groups"][0]["params"]) == n_g
        assert len(ckpt["d_optimizer"]["param_groups"][0]["params"]) == n_d


@pytest.mark.heavy
def test_cli_tool_native_to_torch(tmp_path):
    """tools/export_torch_checkpoint.py: native Orbax dir -> torch dir that the
    inference loader resolves (EMA preferred) with identical weights."""
    from msig_tpu.config import InferenceConfig, TrainConfig
    from msig_tpu.train.checkpoint import save_checkpoint
    from msig_tpu.train.state import Models, create_train_state

    tcfg = TrainConfig(image_size=32, style_dim=SDIM, n_residual_blocks=N_RES, use_pallas=False)
    models = Models.from_config(tcfg, NDOM)
    state = create_train_state(tcfg, models, jax.random.PRNGKey(7))
    native = tmp_path / "native"
    meta = {"num_domains": NDOM, "image_size": 32, "style_dim": SDIM,
            "n_residual_blocks": N_RES, "loss_history": {"G_loss": [1.0], "D_loss": [0.2]}}
    save_checkpoint(str(native), state, meta)

    out = tmp_path / "torch_export"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run(
        [sys.executable, "tools/export_torch_checkpoint.py",
         "--checkpoint_dir", str(native), "--out_dir", str(out)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)), timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    cfg = InferenceConfig(style_dim=SDIM, n_residual_blocks=N_RES, image_size=32)
    gen, se_b, _, used_ema = load_inference_params_helper(str(out), cfg)
    assert used_ema  # ema_checkpoint.pth written and preferred
    _assert_trees_equal(jax.device_get(state.ema_params["G_A2B"]), jax.device_get(gen))
    _assert_trees_equal(jax.device_get(state.ema_params["SE_B"]), jax.device_get(se_b))


def load_inference_params_helper(path, cfg):
    from msig_tpu.infer.loading import load_inference_params

    gen, se_b, meta, used_ema = load_inference_params(path, cfg, NDOM)
    return gen, se_b, meta, used_ema
