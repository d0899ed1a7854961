"""Import reference-format torch checkpoints into msig_tpu param pytrees.

The reference saves ``checkpoint.pth`` (six state_dicts + optimizers) and
``ema_checkpoint.pth`` (four EMA state_dicts) per checkpoint directory
(/root/reference/trainer.py:157-173). This module converts those
state_dicts into our flax param pytrees so users can bring trained
reference models straight into the TPU inference/training stack.

Layout conversions (NCHW/OIHW torch -> NHWC/HWIO here):
  - Conv2d weight [O,I,kh,kw] -> [kh,kw,I,O]
  - ConvTranspose2d weight [I,O,kh,kw] -> flip_hw(transpose to [kh,kw,I,O])
    (our TorchConvTranspose runs the equivalent input-dilated forward conv;
    see msig_tpu/models/layers.py)
  - Linear weight [O,I] -> [I,O]
  - per-domain branch lists -> single stacked dense/conv (models/networks.py)

Adam moments are not imported (shape-compatible in principle, but the
reference's torch Adam state is keyed by flat param order; retraining
re-warms them in a few steps).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

Params = Dict[str, Any]


def _conv(sd, prefix) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


def _conv_t(sd, prefix) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)  # [I,O,kh,kw]
    kernel = np.flip(np.transpose(w, (2, 3, 0, 1)), axis=(0, 1)).copy()
    return {"kernel": kernel, "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _linear(sd, prefix) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)  # [O,I]
    return {"kernel": w.T.copy(), "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def import_generator(sd: Dict[str, np.ndarray], n_residual_blocks: int = 8) -> Params:
    """Reference StyleCycleGANGenerator state_dict -> our generator params.

    Torch module indices (reference model.py:130-143): content_encoder convs
    at 0/3/6; decoder resblocks 0..n-1, ConvT at n, n+3, final conv at n+6.
    """
    p: Params = {
        "enc_conv0": _conv(sd, "content_encoder.0"),
        "enc_conv1": _conv(sd, "content_encoder.3"),
        "enc_conv2": _conv(sd, "content_encoder.6"),
    }
    for i in range(n_residual_blocks):
        p[f"resblock{i}"] = {
            "conv1": _conv(sd, f"decoder.{i}.conv1"),
            "conv2": _conv(sd, f"decoder.{i}.conv2"),
            "adain1": {"style_mod": _linear(sd, f"decoder.{i}.adain1.style_modulation")},
            "adain2": {"style_mod": _linear(sd, f"decoder.{i}.adain2.style_modulation")},
        }
    n = n_residual_blocks
    p["dec_up0"] = _conv_t(sd, f"decoder.{n}")
    p["dec_up1"] = _conv_t(sd, f"decoder.{n + 3}")
    p["dec_conv_out"] = _conv(sd, f"decoder.{n + 6}")
    return {"params": p}


def import_style_encoder(sd: Dict[str, np.ndarray], num_domains: int, style_dim: int) -> Params:
    """Reference MultiDomainStyleEncoder state_dict -> our params.

    Shared convs at shared_layers.{0,2,4,6} (model.py:71-77); per-domain 1x1
    convs ``domain_branches.{d}.0`` stack into one [512, D*S] dense.
    """
    p: Params = {}
    for i, idx in enumerate((0, 2, 4, 6)):
        p[f"conv{i}"] = _conv(sd, f"shared_layers.{idx}")
    kernel = np.zeros((512, num_domains * style_dim), np.float32)
    bias = np.zeros((num_domains * style_dim,), np.float32)
    for d in range(num_domains):
        w = np.asarray(sd[f"domain_branches.{d}.0.weight"], np.float32)  # [S,512,1,1]
        b = np.asarray(sd[f"domain_branches.{d}.0.bias"], np.float32)
        kernel[:, d * style_dim : (d + 1) * style_dim] = w[:, :, 0, 0].T
        bias[d * style_dim : (d + 1) * style_dim] = b
    p["branches"] = {"kernel": kernel, "bias": bias}
    return {"params": p}


def import_discriminator(sd: Dict[str, np.ndarray], num_domains: int) -> Params:
    """Reference MultiDomainDiscriminator state_dict -> our params.

    Shared convs at shared_layers.{0,2,5,8} (model.py:164-176); per-domain
    head convs ``domain_branches.{d}.1`` stack into one [4,4,512,D] conv.
    """
    p: Params = {}
    for i, idx in enumerate((0, 2, 5, 8)):
        p[f"conv{i}"] = _conv(sd, f"shared_layers.{idx}")
    kernel = np.zeros((4, 4, 512, num_domains), np.float32)
    bias = np.zeros((num_domains,), np.float32)
    for d in range(num_domains):
        w = np.asarray(sd[f"domain_branches.{d}.1.weight"], np.float32)  # [1,512,4,4]
        kernel[:, :, :, d] = np.transpose(w[0], (1, 2, 0))
        bias[d] = np.asarray(sd[f"domain_branches.{d}.1.bias"], np.float32)[0]
    p["heads"] = {"kernel": kernel, "bias": bias}
    return {"params": p}


def _to_numpy_sd(sd) -> Dict[str, np.ndarray]:
    return {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
            for k, v in sd.items()}


def load_torch_checkpoint_dir(
    checkpoint_dir: str, num_domains: int, style_dim: int = 256, n_residual_blocks: int = 8
):
    """Read a reference checkpoint directory -> (gen_params, disc_params, ema_params).

    ``ema_params`` is None when ``ema_checkpoint.pth`` is absent.
    Requires torch for unpickling.
    """
    import os

    import torch

    ckpt = torch.load(
        os.path.join(checkpoint_dir, "checkpoint.pth"), map_location="cpu", weights_only=False
    )
    gen_params = {
        "G_A2B": import_generator(_to_numpy_sd(ckpt["G_A2B"]), n_residual_blocks),
        "G_B2A": import_generator(_to_numpy_sd(ckpt["G_B2A"]), n_residual_blocks),
        "SE_A": import_style_encoder(_to_numpy_sd(ckpt["SE_A"]), num_domains, style_dim),
        "SE_B": import_style_encoder(_to_numpy_sd(ckpt["SE_B"]), num_domains, style_dim),
    }
    disc_params = {
        "D_A": import_discriminator(_to_numpy_sd(ckpt["D_A"]), num_domains),
        "D_B": import_discriminator(_to_numpy_sd(ckpt["D_B"]), num_domains),
    }
    ema_params = None
    ema_path = os.path.join(checkpoint_dir, "ema_checkpoint.pth")
    if os.path.exists(ema_path):
        ema = torch.load(ema_path, map_location="cpu", weights_only=False)
        ema_params = {
            "G_A2B": import_generator(_to_numpy_sd(ema["ema_G_A2B"]), n_residual_blocks),
            "G_B2A": import_generator(_to_numpy_sd(ema["ema_G_B2A"]), n_residual_blocks),
            "SE_A": import_style_encoder(_to_numpy_sd(ema["ema_SE_A"]), num_domains, style_dim),
            "SE_B": import_style_encoder(_to_numpy_sd(ema["ema_SE_B"]), num_domains, style_dim),
        }
    return gen_params, disc_params, ema_params
