"""VGG19-prefix perceptual feature extractor + style/content losses.

Reference-parity notes (/root/reference/losses.py):

  - The reference's layer naming is idiosyncratic (losses.py:24-35): its
    ``relu_1_1 … relu_5_1`` are VGG19's *first five ReLUs* — canonical
    relu1_1, relu1_2, relu2_1, relu2_2, relu3_1 — and its content layer
    ``relu_4_1`` is canonical relu2_2. Parity means matching the layers
    actually used, NOT the Gatys-style names. Consequently only the first
    five convs + two maxpools of VGG19 are ever needed; the reference
    wastefully runs all 36 feature layers (losses.py:64-67) — here the
    network simply ends after conv5, a large compute saving with identical
    loss values.
  - Style loss: L1 between batch-coupled Gram matrices at all five layers
    (losses.py:80-89, Gram semantics in :mod:`msig_tpu.ops.gram`).
  - Content loss: L1 on the 4th ReLU's features (losses.py:91-98).
  - Input images are in [-1, 1]; they are shifted to [0, 1] then ImageNet-
    normalized (losses.py:46-56).

Weights: pretrained ImageNet weights are loaded from an .npz produced by
``tools/convert_vgg_weights.py`` (run once in any environment that has
torchvision). Without a weights file the extractor falls back to a
*deterministic seeded random* VGG — losses remain well-defined and the whole
pipeline runs, but perceptual quality then differs from the reference;
the fallback is logged loudly.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msig_tpu.ops.gram import gram_matrix

# Channel plan of the required VGG19 prefix: conv index -> (cin, cout).
# Canonical names: conv1_1, conv1_2, conv2_1, conv2_2, conv3_1.
_VGG_PREFIX: List[Tuple[int, int]] = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256)]
# Maxpool (2x2, stride 2) sits after ReLU of conv #2 and conv #4 (0-indexed 1 and 3).
_POOL_AFTER = {1, 3}
# Reference's content layer 'relu_4_1' == output of ReLU after conv #4 (0-indexed 3).
_CONTENT_INDEX = 3

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

VGGParams = Dict[str, Dict[str, jax.Array]]


def init_vgg_params(seed: int = 1234) -> VGGParams:
    """Deterministic random-init fallback (torch conv default distribution)."""
    key = jax.random.PRNGKey(seed)
    params: VGGParams = {}
    for i, (cin, cout) in enumerate(_VGG_PREFIX):
        key, k1, k2 = jax.random.split(key, 3)
        bound = 1.0 / math.sqrt(3 * 3 * cin)
        params[f"conv{i}"] = {
            "kernel": jax.random.uniform(k1, (3, 3, cin, cout), jnp.float32, -bound, bound),
            "bias": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
        }
    return params


def load_vgg_params(path: str) -> VGGParams:
    """Load converted pretrained weights (see tools/convert_vgg_weights.py)."""
    data = np.load(path)
    params: VGGParams = {}
    for i, (cin, cout) in enumerate(_VGG_PREFIX):
        kernel = data[f"conv{i}_kernel"]
        bias = data[f"conv{i}_bias"]
        assert kernel.shape == (3, 3, cin, cout), (i, kernel.shape)
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(kernel, jnp.float32),
            "bias": jnp.asarray(bias, jnp.float32),
        }
    return params


def get_vgg_params(path: Optional[str]) -> VGGParams:
    if path:
        return load_vgg_params(path)
    import logging

    logging.getLogger(__name__).warning(
        "No VGG19 weights file given — using a deterministic randomly-initialized "
        "VGG for the perceptual loss. Convert pretrained weights with "
        "tools/convert_vgg_weights.py for reference-parity perceptual quality."
    )
    return init_vgg_params()


def _normalize_imagenet(x: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[-1, 1] -> [0, 1] -> ImageNet normalization (losses.py:49-56)."""
    x01 = (x.astype(jnp.float32) + 1.0) * 0.5
    mean = jnp.asarray(_IMAGENET_MEAN)
    std = jnp.asarray(_IMAGENET_STD)
    return ((x01 - mean) / std).astype(dtype)


def _max_pool_2x2(x: jax.Array) -> jax.Array:
    # 2x2/stride-2 max pool as a reshape+max (equivalent for even H,W, and
    # reverse-mode differentiable in any dtype, unlike reduce_window-max
    # with a non-f32 init on this JAX version). A strided-slice variant
    # avoids the padded 6-D backward broadcast but measured slower overall
    # (round 2); the remat in style_content_loss_pair bounds its liveness.
    b, h, w, c = x.shape
    return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))


def vgg_features(
    params: VGGParams, img: jax.Array, upto: int = 5, dtype=None
) -> List[jax.Array]:
    """ReLU outputs of the first ``upto`` convs of VGG19 for a [-1,1] NHWC image.

    ``dtype`` sets the conv compute precision (default: the input's dtype, so
    a bf16 train step runs the perceptual forward on the bf16 MXU path; the
    Gram matrices and L1 reductions downstream are always fp32).
    """
    dtype = dtype or img.dtype
    if dtype == jnp.uint8:
        dtype = jnp.float32
    x = _normalize_imagenet(img, dtype)
    feats: List[jax.Array] = []
    for i in range(upto):
        p = params[f"conv{i}"]
        x = jax.lax.conv_general_dilated(
            x, p["kernel"].astype(dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"].astype(dtype)
        x = jax.nn.relu(x)
        feats.append(x)
        if i in _POOL_AFTER and i + 1 < upto:
            x = _max_pool_2x2(x)
    return feats


def style_content_loss(
    params: VGGParams,
    generated: jax.Array,
    real_style: jax.Array,
    real_content: jax.Array,
    gram_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """(content_loss, style_loss) — semantics of reference losses.py:100-115.

    Style: sum over the five layers of L1 between batch-coupled Grams of
    (generated, real_style). Content: L1 between layer-4 features of
    (generated, real_content). ``gram_dtype`` sets the Gram matmul input
    precision (fp32 accumulation either way — see ops/gram.py).
    """
    gen_feats = vgg_features(params, generated, upto=5)
    sty_feats = vgg_features(params, real_style, upto=5)
    con_feats = vgg_features(params, real_content, upto=_CONTENT_INDEX + 1)

    style_loss = jnp.asarray(0.0, jnp.float32)
    for g, s in zip(gen_feats, sty_feats):
        style_loss += jnp.mean(jnp.abs(gram_matrix(g, gram_dtype)
                                       - gram_matrix(s, gram_dtype)))

    g4 = gen_feats[_CONTENT_INDEX].astype(jnp.float32)
    c4 = con_feats[_CONTENT_INDEX].astype(jnp.float32)
    content_loss = jnp.mean(jnp.abs(g4 - c4))
    return content_loss, style_loss


def style_content_loss_pair(
    params: VGGParams,
    fake_B: jax.Array,
    real_B: jax.Array,
    real_A: jax.Array,
    fake_A: jax.Array,
    gram_dtype=jnp.float32,
) -> Tuple[Tuple[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    """Both perceptual directions with ONE batched VGG forward.

    Equivalent to
        style_content_loss(params, fake_B, real_B, real_A),
        style_content_loss(params, fake_A, real_A, real_B)
    but runs the VGG prefix once on ``concat([fake_B, fake_A, real_A,
    real_B])`` (4B rows) instead of six times on B rows — the reference
    calls its VGG twice with 3 images each (/root/reference/trainer.py:104,
    109) and real_A/real_B appear in both calls. Gram matrices stay
    batch-coupled WITHIN each original B-group, exactly as the reference's
    ``view(a*b, c*d)`` Gram does per call (losses.py:70-78).

    Returns ((content_B, style_B), (content_A, style_A)).
    """
    b = fake_B.shape[0]
    stack = jnp.concatenate([fake_B, fake_A, real_A, real_B], axis=0)
    # Remat: the 4B feature maps and the padded pool/Gram backward
    # temporaries would otherwise be live simultaneously; recomputing the
    # 5-conv prefix in the backward keeps the pair path inside HBM (this
    # exact configuration trained 150 real-data epochs at batch 8).
    feats = jax.checkpoint(
        lambda prm, st: vgg_features(prm, st, upto=5))(params, stack)

    def group(f, i):
        return f[i * b:(i + 1) * b]

    style_B = jnp.asarray(0.0, jnp.float32)
    style_A = jnp.asarray(0.0, jnp.float32)
    for f in feats:
        g_fb = gram_matrix(group(f, 0), gram_dtype)
        g_fa = gram_matrix(group(f, 1), gram_dtype)
        g_ra = gram_matrix(group(f, 2), gram_dtype)
        g_rb = gram_matrix(group(f, 3), gram_dtype)
        style_B += jnp.mean(jnp.abs(g_fb - g_rb))
        style_A += jnp.mean(jnp.abs(g_fa - g_ra))

    f4 = feats[_CONTENT_INDEX].astype(jnp.float32)
    content_B = jnp.mean(jnp.abs(group(f4, 0) - group(f4, 2)))  # fake_B vs real_A
    content_A = jnp.mean(jnp.abs(group(f4, 1) - group(f4, 3)))  # fake_A vs real_B
    return (content_B, style_B), (content_A, style_A)


def style_content_loss_pair2(
    params: VGGParams,
    fake_B: jax.Array,
    real_B: jax.Array,
    real_A: jax.Array,
    fake_A: jax.Array,
    gram_dtype=jnp.float32,
) -> Tuple[Tuple[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    """Same result as :func:`style_content_loss_pair` via TWO 2B launches.

    Launch 1 stacks [fake_B, real_A] (direction B's content pair), launch 2
    [fake_A, real_B]. Each launch's conv feature pyramid reduces to its
    Grams + a content scalar before the next launch runs, so peak VGG
    activation liveness is 2B feature pyramids (~half the 1x4B pair, which
    exceeds single-chip HBM at batch 32 — docs/PERF.md) while keeping the
    dedup: 4B total VGG work vs 6B for two 3-image calls. Only the Grams
    of launch 1 (small [B*C, B*C] matrices) stay live across launch 2 for
    the cross-launch style terms.
    """
    b = fake_B.shape[0]
    ck = jax.checkpoint(lambda prm, st: vgg_features(prm, st, upto=5))

    def launch(x, y):
        feats = ck(params, jnp.concatenate([x, y], axis=0))
        grams = [(gram_matrix(f[:b], gram_dtype),
                  gram_matrix(f[b:], gram_dtype)) for f in feats]
        f4 = feats[_CONTENT_INDEX].astype(jnp.float32)
        content = jnp.mean(jnp.abs(f4[:b] - f4[b:]))
        return grams, content

    g1, content_B = launch(fake_B, real_A)   # grams: (fake_B, real_A)
    g2, content_A = launch(fake_A, real_B)   # grams: (fake_A, real_B)
    style_B = jnp.asarray(0.0, jnp.float32)
    style_A = jnp.asarray(0.0, jnp.float32)
    for (g_fb, g_ra), (g_fa, g_rb) in zip(g1, g2):
        style_B += jnp.mean(jnp.abs(g_fb - g_rb))
        style_A += jnp.mean(jnp.abs(g_fa - g_ra))
    return (content_B, style_B), (content_A, style_A)
