"""Evaluation: FID and activation statistics."""

from msig_tpu.eval.fid import (  # noqa: F401
    activation_statistics,
    compute_fid,
    fid_between_dirs,
    frechet_distance,
    vgg_feature_fn,
)
