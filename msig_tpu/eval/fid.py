"""FID evaluation: Fréchet distance between feature distributions.

BASELINE.md lists "FID parity" as the quality metric. The canonical FID uses
pool3 features of an ImageNet InceptionV3; those pretrained weights are not
bundled (zero-egress build environment), so the metric here takes a
pluggable feature extractor:

  - ``inception``: InceptionV3 pool3 features loaded from an .npz produced
    by ``tools/convert_inception_weights.py`` (canonical FID — run the
    converter where torchvision is available);
  - ``vgg``: the bundled VGG19-prefix extractor (canonical only when its
    pretrained .npz is supplied; with the deterministic random fallback it
    is a *proxy* FID — self-consistent across runs of this framework and
    useful for relative comparisons, clearly labeled in the output).

The Fréchet distance math is extractor-independent:
``d^2 = |mu1 - mu2|^2 + tr(C1 + C2 - 2 sqrt(C1 C2))``.
"""

from __future__ import annotations

import logging
from typing import Callable, Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """Fréchet distance between two Gaussians (numerically-stabilized)."""
    import scipy.linalg

    def _sqrtm(a):
        out = scipy.linalg.sqrtm(a)
        return out[0] if isinstance(out, tuple) else out  # scipy <1.17 returned (X, errest)

    diff = mu1 - mu2
    covmean = _sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        eps = 1e-6
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def activation_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of an [N, D] feature matrix."""
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def vgg_feature_fn(vgg_params) -> Callable[[np.ndarray], np.ndarray]:
    """Batch uint8 [N,H,W,3] -> pooled VGG-prefix features [N, 256]."""
    from msig_tpu.losses.vgg import vgg_features
    from msig_tpu.train.step import prepare_images

    @jax.jit
    def extract(imgs):
        x = prepare_images(imgs)
        feats = vgg_features(vgg_params, x, upto=5)
        return jnp.mean(feats[-1], axis=(1, 2))  # global-average relu3_1 -> [N,256]

    return lambda imgs: np.asarray(extract(jnp.asarray(imgs)))


def compute_fid(
    batches_a: Iterator[np.ndarray],
    batches_b: Iterator[np.ndarray],
    feature_fn: Callable[[np.ndarray], np.ndarray],
) -> float:
    """FID between two image streams (uint8 NHWC batches)."""
    feats_a = np.concatenate([feature_fn(b) for b in batches_a], axis=0)
    feats_b = np.concatenate([feature_fn(b) for b in batches_b], axis=0)
    if len(feats_a) < 2 or len(feats_b) < 2:
        raise ValueError("need at least 2 images per side for covariance")
    mu1, s1 = activation_statistics(feats_a)
    mu2, s2 = activation_statistics(feats_b)
    return frechet_distance(mu1, s1, mu2, s2)


def fid_between_dirs(
    dir_a: str,
    dir_b: str,
    image_size: int = 256,
    batch_size: int = 32,
    vgg_weights_path: Optional[str] = None,
    inception_weights_path: Optional[str] = None,
) -> float:
    """Directory-level FID.

    Extractor priority: ``inception_weights_path`` (canonical InceptionV3
    pool3, msig_tpu/eval/inception.py) > ``vgg_weights_path`` (VGG-prefix)
    > random-VGG proxy (loudly labeled).
    """
    from msig_tpu.data import list_image_files
    from msig_tpu.data.pipeline import load_inference_image
    from msig_tpu.losses import get_vgg_params

    def batches(d):
        files = list_image_files(d)
        for i in range(0, len(files), batch_size):
            yield np.stack(
                [load_inference_image(p, image_size) for p in files[i : i + batch_size]]
            )

    if inception_weights_path:
        from msig_tpu.eval.inception import inception_feature_fn

        fn = inception_feature_fn(inception_weights_path)
    else:
        fn = vgg_feature_fn(get_vgg_params(vgg_weights_path))
        if not vgg_weights_path:
            logger.warning(
                "FID computed with the randomly-initialized VGG fallback — a PROXY "
                "metric (self-consistent, not comparable to published FID numbers)."
            )
    return compute_fid(batches(dir_a), batches(dir_b), fn)
