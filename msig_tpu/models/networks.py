"""The four network architectures, as flax.linen modules in NHWC.

Capability parity with the reference's model zoo (/root/reference/model.py):

  - :class:`AdaIN` / :class:`AdaINResBlock`  (model.py:9-55)
  - :class:`MultiDomainStyleEncoder`         (model.py:61-118)
  - :class:`StyleCycleGANGenerator`          (model.py:121-151)
  - :class:`MultiDomainDiscriminator`        (model.py:154-213)

TPU-first design notes (differences from the reference's structure, with
identical math):
  - NHWC layout everywhere (MXU-native convolutions).
  - Per-domain branches (style-encoder heads, discriminator heads) are a
    *single stacked* conv/dense with ``num_domains`` outputs followed by a
    per-sample gather — numerically identical to the reference's
    "run every branch then index" (model.py:108-116, 204-212) but expressed
    as one large MXU matmul instead of a Python loop over branches.
  - Instance-norm statistics always accumulate in float32 regardless of the
    conv compute dtype (GAN-stability on bf16).
  - AdaIN normalize+modulate goes through :func:`msig_tpu.ops.adain_modulate`
    which can route to a fused Pallas kernel on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from msig_tpu.models.layers import (
    TorchConv,
    TorchConvTranspose,
    TorchDense,
    leaky_relu,
)
from msig_tpu.ops.norm import adain_modulate, instance_norm


class AdaIN(nn.Module):
    """Adaptive instance norm: IN(x) modulated by style-derived (gamma, beta).

    Equivalent to reference model.py:9-36 — ``Linear(style_dim -> 2C)`` then
    ``gamma * IN(x) + beta``. The linear output layout matches torch's
    ``chunk(2, dim=1)``: first C features are gamma, last C are beta.
    """

    channels: int
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, style: jax.Array,
                 return_affine: bool = False):
        if style.ndim == 4:  # accept [B, 1, 1, S] like the reference's squeeze
            style = style.reshape(style.shape[0], style.shape[-1])
        params = TorchDense(2 * self.channels, dtype=self.dtype, name="style_mod")(style)
        gamma, beta = jnp.split(params, 2, axis=-1)
        if return_affine:
            # (gamma, beta) for a conv module that applies the modulation
            # itself (TorchConv adain_affine — enables the fused
            # conv+IN+modulate backward unit). x is unused.
            return gamma, beta
        return adain_modulate(x, gamma, beta, use_pallas=self.use_pallas)


class AdaINResBlock(nn.Module):
    """conv3x3 -> AdaIN -> ReLU -> conv3x3 -> AdaIN -> + residual.

    No post-sum activation (reference model.py:51-55).
    """

    channels: int
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, style: jax.Array) -> jax.Array:
        # The AdaIN modules provide (gamma, beta); the conv modules apply
        # the modulation (TorchConv adain_affine). Identical math to
        # conv -> AdaIN chains, but lets MSIG_CONV_VJP=2 run each
        # conv+IN+modulate unit with a single fused Pallas backward.
        # relu is folded into conv2 (pre_relu) so the backward can absorb
        # the mask into its dx epilogue.
        g1, b1 = AdaIN(self.channels, self.dtype, self.use_pallas,
                       name="adain1")(x, style, return_affine=True)
        g2, b2 = AdaIN(self.channels, self.dtype, self.use_pallas,
                       name="adain2")(x, style, return_affine=True)
        h = TorchConv(self.channels, 3, padding=1, dtype=self.dtype,
                      name="conv1")(x, adain_affine=(g1, b1),
                                    adain_use_pallas=self.use_pallas)
        h = TorchConv(self.channels, 3, padding=1, dtype=self.dtype,
                      pre_relu=True, name="conv2")(h, adain_affine=(g2, b2),
                                                   adain_use_pallas=self.use_pallas)
        return h + x


class MultiDomainStyleEncoder(nn.Module):
    """Shared conv trunk + per-domain style heads.

    Trunk: 4x [conv4x4 stride 2 (3->64->128->256->512) + ReLU], then global
    average pool (reference model.py:71-77). The per-domain 1x1-conv branches
    (model.py:80-87) are one stacked dense ``512 -> num_domains*style_dim``;
    the output for each sample's ``domain_idx`` is gathered, reproducing the
    compute-all-branches-then-index semantics of model.py:108-116.
    """

    style_dim: int = 256
    num_domains: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, img: jax.Array, domain_idx: Optional[jax.Array] = None) -> jax.Array:
        h = img
        for i, feats in enumerate((64, 128, 256, 512)):
            h = TorchConv(feats, 4, strides=2, padding=1, dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.relu(h)
        pooled = jnp.mean(h.astype(jnp.float32), axis=(1, 2))  # [B, 512]
        pooled = pooled.astype(h.dtype)
        all_styles = TorchDense(
            self.num_domains * self.style_dim, dtype=self.dtype, name="branches"
        )(pooled)
        all_styles = all_styles.reshape(-1, self.num_domains, self.style_dim)
        if domain_idx is None:
            return all_styles[:, 0, :]
        idx = domain_idx.reshape(-1, 1, 1).astype(jnp.int32)
        return jnp.take_along_axis(
            all_styles, jnp.broadcast_to(idx, (all_styles.shape[0], 1, self.style_dim)), axis=1
        )[:, 0, :]


class StyleCycleGANGenerator(nn.Module):
    """Content encoder + style-injected decoder (reference model.py:121-151).

    Encoder: reflect-pad conv7x7 (3->64) + IN + ReLU, then two stride-2
    conv4x4 stages (64->128->256) + IN + ReLU. Decoder: ``n_residual_blocks``
    AdaIN residual blocks at 256ch, two ConvTranspose(4,2,1) upsampling
    stages + IN + ReLU, reflect conv7x7 to RGB + tanh. Style codes feed only
    the residual blocks (model.py:148-151).
    """

    in_channels: int = 3
    out_channels: int = 3
    style_dim: int = 256
    n_residual_blocks: int = 8
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, content_image: jax.Array, style_code: jax.Array) -> jax.Array:
        h = TorchConv(64, 7, padding=3, pad_mode="reflect", dtype=self.dtype, name="enc_conv0")(
            content_image
        )
        h = nn.relu(instance_norm(h))
        h = TorchConv(128, 4, strides=2, padding=1, dtype=self.dtype, name="enc_conv1")(h)
        h = nn.relu(instance_norm(h))
        h = TorchConv(256, 4, strides=2, padding=1, dtype=self.dtype, name="enc_conv2")(h)
        h = nn.relu(instance_norm(h))

        for i in range(self.n_residual_blocks):
            h = AdaINResBlock(256, self.dtype, self.use_pallas, name=f"resblock{i}")(
                h, style_code
            )

        h = TorchConvTranspose(128, 4, strides=2, padding=1, dtype=self.dtype, name="dec_up0")(h)
        h = nn.relu(instance_norm(h))
        h = TorchConvTranspose(64, 4, strides=2, padding=1, dtype=self.dtype, name="dec_up1")(h)
        h = nn.relu(instance_norm(h))
        h = TorchConv(
            self.out_channels, 7, padding=3, pad_mode="reflect", dtype=self.dtype, name="dec_conv_out"
        )(h)
        return jnp.tanh(h)


class MultiDomainDiscriminator(nn.Module):
    """PatchGAN with shared trunk and per-domain heads (model.py:154-213).

    Trunk: conv4x4 stride-2 blocks 3->64 (no IN), 64->128, 128->256, 256->512
    with IN + LeakyReLU(0.2). Heads: asymmetric ZeroPad2d((1,0,1,0)) + conv4x4
    pad 1 per domain — implemented as ONE conv with ``num_domains`` output
    channels and effective padding ((2,1),(2,1)), then a per-sample channel
    gather. For 256x256 input the output is [B, 16, 16, 1].
    """

    in_channels: int = 3
    num_domains: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, img: jax.Array, domain_idx: Optional[jax.Array] = None) -> jax.Array:
        h = img
        for i, (feats, norm) in enumerate(
            ((64, False), (128, True), (256, True), (512, True))
        ):
            h = TorchConv(feats, 4, strides=2, padding=1, dtype=self.dtype, name=f"conv{i}")(h)
            if norm:
                h = instance_norm(h)
            h = leaky_relu(h, 0.2)
        # ZeroPad2d((left=1, right=0, top=1, bottom=0)) + conv4x4(pad=1)
        # == conv4x4 with padding ((top=2, bottom=1), (left=2, right=1)).
        all_heads = TorchConv(
            self.num_domains, 4, padding=((2, 1), (2, 1)), dtype=self.dtype, name="heads"
        )(h)  # [B, H', W', num_domains]
        if domain_idx is None:
            return all_heads[..., 0:1]
        idx = domain_idx.reshape(-1, 1, 1, 1).astype(jnp.int32)
        b, hh, ww, _ = all_heads.shape
        return jnp.take_along_axis(
            all_heads, jnp.broadcast_to(idx, (b, hh, ww, 1)), axis=3
        )
