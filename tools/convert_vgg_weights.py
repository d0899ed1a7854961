#!/usr/bin/env python
"""Convert pretrained VGG19 weights to the .npz the perceptual loss loads.

Only the first five conv layers of ``vgg19.features`` are needed (see
msig_tpu/losses/vgg.py — the reference's style/content layer set lives
entirely in that prefix). Run this once in any environment with torchvision
(or pass a raw ``state_dict`` .pth), then ship the small (~1.1 MB) .npz:

    python tools/convert_vgg_weights.py --out vgg19_prefix.npz
    python tools/convert_vgg_weights.py --state-dict vgg19.pth --out vgg19_prefix.npz

Torchvision layer indices of the prefix convs: features.{0,2,5,7,10}.
Kernels are converted OIHW -> HWIO for NHWC convolution.
"""

import argparse

import numpy as np

_TORCH_CONV_INDICES = [0, 2, 5, 7, 10]


def convert(state_dict) -> dict:
    out = {}
    for i, t_idx in enumerate(_TORCH_CONV_INDICES):
        w = state_dict[f"features.{t_idx}.weight"]
        b = state_dict[f"features.{t_idx}.bias"]
        w = np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)
        b = np.asarray(b.detach().cpu().numpy() if hasattr(b, "detach") else b)
        out[f"conv{i}_kernel"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        out[f"conv{i}_bias"] = b.astype(np.float32)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--state-dict", type=str, default=None,
                    help="Path to a VGG19 state_dict .pth; defaults to torchvision download")
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()

    if args.state_dict:
        import torch

        sd = torch.load(args.state_dict, map_location="cpu", weights_only=True)
    else:
        from torchvision import models

        sd = models.vgg19(weights=models.VGG19_Weights.DEFAULT).state_dict()

    np.savez(args.out, **convert(sd))
    print(f"Wrote VGG19 prefix weights to {args.out}")


if __name__ == "__main__":
    main()
