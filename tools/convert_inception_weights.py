#!/usr/bin/env python
"""Convert InceptionV3 (FID) weights for msig_tpu's canonical FID path.

Run where torchvision is available; produces an .npz of the pool3 feature
extractor's parameters. The zero-egress build environment cannot download
these — the FID module falls back to a labeled proxy metric without them
(msig_tpu/eval/fid.py).

    python tools/convert_inception_weights.py --out inception_fid.npz

NOTE: the FID-standard weights are torchvision's ``FID_Weights`` variant of
InceptionV3 (pytorch-fid's checkpoint), not the ImageNet classifier.
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from torchvision import models

    net = models.inception_v3(weights=models.Inception_V3_Weights.DEFAULT)
    sd = net.state_dict()
    out = {}
    for k, v in sd.items():
        if k.startswith("fc."):
            continue  # classifier head not needed for pool3 features
        out[k.replace(".", "__")] = v.detach().cpu().numpy().astype(np.float32)
    np.savez_compressed(args.out, **out)
    print(f"Wrote {len(out)} arrays to {args.out}")


if __name__ == "__main__":
    main()
