"""InceptionV3 pool3 feature extractor (JAX) — the canonical-FID backbone.

Consumes the ``.npz`` produced by ``tools/convert_inception_weights.py``
(torchvision ``inception_v3`` state_dict with ``.``→``__`` key mangling,
classifier head dropped) and reproduces torchvision's eval-mode forward up
to the global average pool: 2048-dim "pool3" features, the layer canonical
FID is defined on. This closes the loop the FID module promises
(msig_tpu/eval/fid.py): without this forward the converted weights had no
consumer.

Protocol: images are bilinearly resized to 299x299, scaled to [0,1],
ImageNet-normalized, and passed through ``transform_input=True`` (the
torchvision pretrained-model convention). Architecture and feature layer
match the FID standard (InceptionV3 pool3); the torchvision ImageNet
weights differ from pytorch-fid's TF-ported checkpoint, so scores are
canonical in protocol but not numerically interchangeable with
pytorch-fid numbers — the tool output labels which weights were used.

All convs are bias-free + BatchNorm(eps=0.001, eval mode) + ReLU
(torchvision ``BasicConv2d``). NHWC layout; OIHW conv weights are
transposed to HWIO once at load.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp

BN_EPS = 1e-3


def load_inception_params(npz_path: str) -> Dict[str, Any]:
    """``convert_inception_weights.py`` npz -> {'<Module>.<branch>': tensors}.

    Each BasicConv2d collapses to {w: [kh,kw,I,O], scale, bias, mean, var}
    with the BN folded-ready eval statistics kept separate (not pre-folded,
    so the npz round-trips losslessly).
    """
    flat = np.load(npz_path)
    mods: Dict[str, Dict[str, np.ndarray]] = {}
    for key in flat.files:
        parts = key.split("__")
        if parts[0] == "AuxLogits" or parts[-1] == "num_batches_tracked":
            continue  # train-time head / counter: not part of the pool3 path
        leaf = parts[-1]
        kind = parts[-2]  # 'conv' | 'bn'
        name = ".".join(parts[:-2])
        slot = mods.setdefault(name, {})
        if kind == "conv" and leaf == "weight":
            slot["w"] = np.transpose(flat[key].astype(np.float32), (2, 3, 1, 0))
        elif kind == "bn":
            slot[{"weight": "scale", "bias": "bias",
                  "running_mean": "mean", "running_var": "var"}[leaf]] = (
                flat[key].astype(np.float32))
    return mods


def _basic(p: Dict[str, Any], name: str, x, stride=1, padding=(0, 0)):
    """BasicConv2d: bias-free conv + BatchNorm(eval, eps=1e-3) + ReLU."""
    m = p[name]
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = padding
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(m["w"]),
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    inv = jax.lax.rsqrt(jnp.asarray(m["var"]) + BN_EPS)
    y = (y - jnp.asarray(m["mean"])) * (inv * jnp.asarray(m["scale"])) + jnp.asarray(m["bias"])
    return jnp.maximum(y, 0)


def _maxpool3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _avgpool3s1p1(x):
    # torch F.avg_pool2d(3, stride=1, padding=1) default count_include_pad=True
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / 9.0


def _inception_a(p, n, x):
    b1 = _basic(p, f"{n}.branch1x1", x)
    b5 = _basic(p, f"{n}.branch5x5_2", _basic(p, f"{n}.branch5x5_1", x), padding=(2, 2))
    b3 = _basic(p, f"{n}.branch3x3dbl_1", x)
    b3 = _basic(p, f"{n}.branch3x3dbl_2", b3, padding=(1, 1))
    b3 = _basic(p, f"{n}.branch3x3dbl_3", b3, padding=(1, 1))
    bp = _basic(p, f"{n}.branch_pool", _avgpool3s1p1(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, n, x):
    b3 = _basic(p, f"{n}.branch3x3", x, stride=2)
    bd = _basic(p, f"{n}.branch3x3dbl_1", x)
    bd = _basic(p, f"{n}.branch3x3dbl_2", bd, padding=(1, 1))
    bd = _basic(p, f"{n}.branch3x3dbl_3", bd, stride=2)
    return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


def _inception_c(p, n, x):
    b1 = _basic(p, f"{n}.branch1x1", x)
    b7 = _basic(p, f"{n}.branch7x7_1", x)
    b7 = _basic(p, f"{n}.branch7x7_2", b7, padding=(0, 3))
    b7 = _basic(p, f"{n}.branch7x7_3", b7, padding=(3, 0))
    bd = _basic(p, f"{n}.branch7x7dbl_1", x)
    bd = _basic(p, f"{n}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = _basic(p, f"{n}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = _basic(p, f"{n}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = _basic(p, f"{n}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = _basic(p, f"{n}.branch_pool", _avgpool3s1p1(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, n, x):
    b3 = _basic(p, f"{n}.branch3x3_2", _basic(p, f"{n}.branch3x3_1", x), stride=2)
    b7 = _basic(p, f"{n}.branch7x7x3_1", x)
    b7 = _basic(p, f"{n}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = _basic(p, f"{n}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = _basic(p, f"{n}.branch7x7x3_4", b7, stride=2)
    return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


def _inception_e(p, n, x):
    b1 = _basic(p, f"{n}.branch1x1", x)
    b3 = _basic(p, f"{n}.branch3x3_1", x)
    b3 = jnp.concatenate([
        _basic(p, f"{n}.branch3x3_2a", b3, padding=(0, 1)),
        _basic(p, f"{n}.branch3x3_2b", b3, padding=(1, 0)),
    ], axis=-1)
    bd = _basic(p, f"{n}.branch3x3dbl_1", x)
    bd = _basic(p, f"{n}.branch3x3dbl_2", bd, padding=(1, 1))
    bd = jnp.concatenate([
        _basic(p, f"{n}.branch3x3dbl_3a", bd, padding=(0, 1)),
        _basic(p, f"{n}.branch3x3dbl_3b", bd, padding=(1, 0)),
    ], axis=-1)
    bp = _basic(p, f"{n}.branch_pool", _avgpool3s1p1(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def _transform_input(x01):
    """torchvision transform_input=True on ImageNet-normalized input.

    Equivalent simplification: the composition of ImageNet normalization and
    torchvision's per-channel re-transform is exactly ``x01 * 2 - 1``
    (the TF-style [-1, 1] scaling the original network was trained with).
    """
    return x01 * 2.0 - 1.0


def inception_pool3(params: Dict[str, Any], x01: jax.Array) -> jax.Array:
    """[N,299,299,3] float32 in [0,1] -> [N,2048] pool3 features."""
    x = _transform_input(x01)
    x = _basic(params, "Conv2d_1a_3x3", x, stride=2)
    x = _basic(params, "Conv2d_2a_3x3", x)
    x = _basic(params, "Conv2d_2b_3x3", x, padding=(1, 1))
    x = _maxpool3s2(x)
    x = _basic(params, "Conv2d_3b_1x1", x)
    x = _basic(params, "Conv2d_4a_3x3", x)
    x = _maxpool3s2(x)
    x = _inception_a(params, "Mixed_5b", x)
    x = _inception_a(params, "Mixed_5c", x)
    x = _inception_a(params, "Mixed_5d", x)
    x = _inception_b(params, "Mixed_6a", x)
    x = _inception_c(params, "Mixed_6b", x)
    x = _inception_c(params, "Mixed_6c", x)
    x = _inception_c(params, "Mixed_6d", x)
    x = _inception_c(params, "Mixed_6e", x)
    x = _inception_d(params, "Mixed_7a", x)
    x = _inception_e(params, "Mixed_7b", x)
    x = _inception_e(params, "Mixed_7c", x)
    return jnp.mean(x, axis=(1, 2))  # adaptive avgpool (1,1) -> [N, 2048]


def inception_feature_fn(npz_path: str):
    """uint8 [N,H,W,3] batches -> [N,2048] pool3 features (resize to 299)."""
    params = load_inception_params(npz_path)
    jparams = jax.tree.map(jnp.asarray, params)

    @jax.jit
    def extract(imgs_u8):
        x = imgs_u8.astype(jnp.float32) / 255.0
        n = imgs_u8.shape[0]
        x = jax.image.resize(x, (n, 299, 299, 3), method="bilinear")
        return inception_pool3(jparams, x)

    return lambda imgs: np.asarray(extract(jnp.asarray(imgs)))
