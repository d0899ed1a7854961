"""Evaluation: FID (VGG-prefix proxy or canonical InceptionV3 pool3)."""

from msig_tpu.eval.fid import (  # noqa: F401
    activation_statistics,
    compute_fid,
    fid_between_dirs,
    frechet_distance,
    vgg_feature_fn,
)
from msig_tpu.eval.inception import (  # noqa: F401
    inception_feature_fn,
    inception_pool3,
    load_inception_params,
)
