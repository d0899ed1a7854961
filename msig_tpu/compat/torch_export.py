"""Export msig_tpu param pytrees as reference-format torch checkpoints.

Inverse of :mod:`msig_tpu.compat.torch_import`: models trained here can be
loaded by the reference's own CLIs — ``inference.py`` reads the exported
``ema_checkpoint.pth``/``checkpoint.pth`` pair (/root/reference/inference.py:19-77)
and ``main.py --resume`` accepts the directory for continued training
(/root/reference/trainer.py:176-207). Together with the importer this makes
checkpoint interop bidirectional: switch frameworks in either direction
without retraining.

Layout conversions (NHWC/HWIO here -> NCHW/OIHW torch) mirror the importer:
  - Conv2d kernel [kh,kw,I,O] -> weight [O,I,kh,kw]
  - ConvTranspose2d: our forward-conv kernel is flip_hw(transpose) of the
    torch weight (see torch_import._conv_t), so the export flips back:
    weight [I,O,kh,kw] = transpose(flip_hw(kernel), (2,3,0,1))
  - Linear kernel [I,O] -> weight [O,I]
  - stacked per-domain dense/conv -> per-domain branch ModuleList entries

Optimizer/scheduler states: the reference pickles torch Adam moments and
CosineAnnealingLR states keyed by flat parameter order
(/root/reference/trainer.py:160-168). Our optax moments are not convertible
one-to-one (different tree keying and clipping composition), so the export
synthesizes *loadable* torch states — real ``torch.optim.Adam`` /
``CosineAnnealingLR`` state_dicts with empty moment state and the correct
param-group sizes, LRs, betas and ``last_epoch``. The reference resumes from
them cleanly; Adam moments re-warm within a few steps (the same documented
trade-off as the import direction, torch_import.py:17-19).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import numpy as np

Params = Dict[str, Any]


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _unwrap(params: Params) -> Params:
    """Accept both {'params': {...}} flax trees and bare {...} trees."""
    return params.get("params", params) if isinstance(params, dict) else params


def _conv(sd: Dict[str, np.ndarray], prefix: str, p: Params) -> None:
    sd[f"{prefix}.weight"] = np.transpose(_np(p["kernel"]), (3, 2, 0, 1)).copy()
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"]).copy()


def _conv_t(sd: Dict[str, np.ndarray], prefix: str, p: Params) -> None:
    kernel = np.flip(_np(p["kernel"]), axis=(0, 1))  # undo the import flip
    sd[f"{prefix}.weight"] = np.transpose(kernel, (2, 3, 0, 1)).copy()  # [I,O,kh,kw]
    sd[f"{prefix}.bias"] = _np(p["bias"]).copy()


def _linear(sd: Dict[str, np.ndarray], prefix: str, p: Params) -> None:
    sd[f"{prefix}.weight"] = _np(p["kernel"]).T.copy()  # [O,I]
    sd[f"{prefix}.bias"] = _np(p["bias"]).copy()


def export_generator(params: Params, n_residual_blocks: int = 8) -> Dict[str, np.ndarray]:
    """Our generator params -> reference StyleCycleGANGenerator state_dict.

    Module indices per /root/reference/model.py:130-143: content_encoder
    convs at 0/3/6; decoder resblocks 0..n-1, ConvT at n and n+3, final
    conv at n+6.
    """
    p = _unwrap(params)
    sd: Dict[str, np.ndarray] = {}
    _conv(sd, "content_encoder.0", p["enc_conv0"])
    _conv(sd, "content_encoder.3", p["enc_conv1"])
    _conv(sd, "content_encoder.6", p["enc_conv2"])
    for i in range(n_residual_blocks):
        rb = p[f"resblock{i}"]
        _conv(sd, f"decoder.{i}.conv1", rb["conv1"])
        _conv(sd, f"decoder.{i}.conv2", rb["conv2"])
        _linear(sd, f"decoder.{i}.adain1.style_modulation", rb["adain1"]["style_mod"])
        _linear(sd, f"decoder.{i}.adain2.style_modulation", rb["adain2"]["style_mod"])
    n = n_residual_blocks
    _conv_t(sd, f"decoder.{n}", p["dec_up0"])
    _conv_t(sd, f"decoder.{n + 3}", p["dec_up1"])
    _conv(sd, f"decoder.{n + 6}", p["dec_conv_out"])
    return sd


def export_style_encoder(params: Params, num_domains: int, style_dim: int) -> Dict[str, np.ndarray]:
    """Our style-encoder params -> reference MultiDomainStyleEncoder state_dict.

    Shared convs at shared_layers.{0,2,4,6}; the stacked [512, D*S] dense
    unstacks into per-domain 1x1 convs ``domain_branches.{d}.0``
    (/root/reference/model.py:71-87).
    """
    p = _unwrap(params)
    sd: Dict[str, np.ndarray] = {}
    for i, idx in enumerate((0, 2, 4, 6)):
        _conv(sd, f"shared_layers.{idx}", p[f"conv{i}"])
    kernel = _np(p["branches"]["kernel"])  # [512, D*S]
    bias = _np(p["branches"]["bias"])
    for d in range(num_domains):
        w = kernel[:, d * style_dim : (d + 1) * style_dim].T  # [S, 512]
        sd[f"domain_branches.{d}.0.weight"] = w[:, :, None, None].copy()  # [S,512,1,1]
        sd[f"domain_branches.{d}.0.bias"] = bias[d * style_dim : (d + 1) * style_dim].copy()
    return sd


def export_discriminator(params: Params, num_domains: int) -> Dict[str, np.ndarray]:
    """Our discriminator params -> reference MultiDomainDiscriminator state_dict.

    Shared convs at shared_layers.{0,2,5,8}; the stacked [4,4,512,D] head
    conv unstacks into per-domain convs ``domain_branches.{d}.1``
    (/root/reference/model.py:164-184).
    """
    p = _unwrap(params)
    sd: Dict[str, np.ndarray] = {}
    for i, idx in enumerate((0, 2, 5, 8)):
        _conv(sd, f"shared_layers.{idx}", p[f"conv{i}"])
    kernel = _np(p["heads"]["kernel"])  # [4,4,512,D]
    bias = _np(p["heads"]["bias"])
    for d in range(num_domains):
        sd[f"domain_branches.{d}.1.weight"] = np.transpose(kernel[:, :, :, d], (2, 0, 1))[
            None
        ].copy()  # [1,512,4,4]
        sd[f"domain_branches.{d}.1.bias"] = bias[d : d + 1].copy()
    return sd


def _to_torch_sd(sd: Dict[str, np.ndarray]):
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}


def _synth_optimizer_state(n_params: int, lr: float, total_epochs: int, last_epoch: int):
    """(adam_state_dict, cosine_scheduler_state_dict) loadable by the reference.

    Built from REAL torch objects so the param-group key set matches the
    installed torch version exactly (torch's Optimizer.load_state_dict
    replaces group dicts wholesale, so missing hyperparameter keys would
    break the next .step()). Moment state is empty: torch treats missing
    per-param state as "not yet stepped" and re-initializes it lazily.
    """
    import torch

    dummy = torch.zeros(1, requires_grad=True)
    opt = torch.optim.Adam([dummy], lr=lr, betas=(0.5, 0.999))  # trainer.py:56-61
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=total_epochs, eta_min=1e-6  # trainer.py:64-65
    )
    opt_sd = opt.state_dict()
    opt_sd["state"] = {}
    opt_sd["param_groups"][0]["params"] = list(range(n_params))
    sched_sd = sched.state_dict()
    # The reference calls scheduler.step() once per completed epoch
    # (trainer.py:349); resuming at `last_epoch` means that many steps.
    sched_sd["last_epoch"] = last_epoch
    sched_sd["_step_count"] = last_epoch + 1
    return opt_sd, sched_sd


def save_torch_checkpoint_dir(
    out_dir: str,
    gen_params: Params,
    disc_params: Params,
    ema_params: Optional[Params] = None,
    *,
    num_domains: int,
    style_dim: int = 256,
    n_residual_blocks: int = 8,
    loss_history: Optional[Dict[str, List[float]]] = None,
    lr_g: float = 2e-4,
    lr_d: float = 1e-4,
    total_epochs: int = 200,
) -> None:
    """Write ``checkpoint.pth`` (+ ``ema_checkpoint.pth``) the reference loads.

    ``gen_params``/``ema_params`` hold G_A2B/G_B2A/SE_A/SE_B trees,
    ``disc_params`` holds D_A/D_B — the same layout the importer returns.
    ``loss_history`` sets the reference's resume epoch
    (start_epoch = len(loss_history['G_loss']), trainer.py:206-207).
    """
    import torch

    loss_history = loss_history if loss_history is not None else {"G_loss": [], "D_loss": []}
    nets = {
        "G_A2B": export_generator(gen_params["G_A2B"], n_residual_blocks),
        "G_B2A": export_generator(gen_params["G_B2A"], n_residual_blocks),
        "SE_A": export_style_encoder(gen_params["SE_A"], num_domains, style_dim),
        "SE_B": export_style_encoder(gen_params["SE_B"], num_domains, style_dim),
        "D_A": export_discriminator(disc_params["D_A"], num_domains),
        "D_B": export_discriminator(disc_params["D_B"], num_domains),
    }
    last_epoch = len(loss_history.get("G_loss", []))
    n_g = sum(len(nets[k]) for k in ("G_A2B", "G_B2A", "SE_A", "SE_B"))
    n_d = sum(len(nets[k]) for k in ("D_A", "D_B"))
    g_opt, g_sched = _synth_optimizer_state(n_g, lr_g, total_epochs, last_epoch)
    d_opt, d_sched = _synth_optimizer_state(n_d, lr_d, total_epochs, last_epoch)
    ckpt = {k: _to_torch_sd(sd) for k, sd in nets.items()}
    ckpt.update(
        g_optimizer=g_opt,
        d_optimizer=d_opt,
        g_scheduler=g_sched,
        d_scheduler=d_sched,
        loss_history=loss_history,
        num_domains=num_domains,
    )
    os.makedirs(out_dir, exist_ok=True)
    torch.save(ckpt, os.path.join(out_dir, "checkpoint.pth"))
    if ema_params is not None:
        ema = {
            "ema_G_A2B": _to_torch_sd(export_generator(ema_params["G_A2B"], n_residual_blocks)),
            "ema_G_B2A": _to_torch_sd(export_generator(ema_params["G_B2A"], n_residual_blocks)),
            "ema_SE_A": _to_torch_sd(
                export_style_encoder(ema_params["SE_A"], num_domains, style_dim)
            ),
            "ema_SE_B": _to_torch_sd(
                export_style_encoder(ema_params["SE_B"], num_domains, style_dim)
            ),
        }
        torch.save(ema, os.path.join(out_dir, "ema_checkpoint.pth"))
