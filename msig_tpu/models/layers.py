"""Building-block layers: NHWC convs with torch-default initialization.

All networks run in NHWC (TPU/MXU-native layout) with fp32 parameters and a
configurable compute dtype. Initializers reproduce torch's defaults
(kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
kernel and bias) so that training dynamics are comparable to the reference,
whose modules all use stock ``nn.Conv2d`` / ``nn.Linear`` / ``nn.ConvTranspose2d``
inits (/root/reference/model.py).
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _conv_vjp_level() -> int:
    """MSIG_CONV_VJP routing level (trace-time):
    0 = off; 1 = supported 3x3 convs get the fused Pallas backward
    (ops/conv3x3_vjp.py); 2 = additionally fuse the following AdaIN's
    IN+modulate backward into the same kernel (conv3x3_adain units)."""
    v = os.environ.get("MSIG_CONV_VJP", "0")
    return int(v) if v in ("0", "1", "2") else 1


def _conv_vjp_enabled() -> bool:
    return _conv_vjp_level() > 0


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); HWIO shape, fan_in = kh*kw*cin."""
    kh, kw, cin, _ = shape
    bound = 1.0 / math.sqrt(kh * kw * cin)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_dense_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); (in, out) shape."""
    cin, _ = shape
    bound = 1.0 / math.sqrt(cin)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class TorchConv(nn.Module):
    """2-D convolution with torch ``nn.Conv2d(k, s, p)`` semantics in NHWC.

    ``padding`` is either an int (symmetric zero pad) or
    ``((top, bottom), (left, right))``; ``pad_mode='reflect'`` reproduces
    torch's ``padding_mode='reflect'`` (used by the generator's 7x7 convs,
    reference model.py:131,141).
    """

    features: int
    kernel_size: int
    strides: int = 1
    padding: int | Tuple[Tuple[int, int], Tuple[int, int]] = 0
    pad_mode: str = "zeros"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    # Apply relu to the INPUT before convolving (semantically identical to
    # nn.relu followed by the conv). Lets the fused Pallas backward absorb
    # the relu mask into its dx epilogue (ops/conv3x3_vjp.relu_conv3x3).
    pre_relu: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, adain_affine=None,
                 adain_use_pallas: bool = False) -> jax.Array:
        """``adain_affine=(gamma, beta)``: apply ``gamma*IN(conv(x))+beta``
        after the conv (AdaIN-followed sites). At MSIG_CONV_VJP=2 supported
        sites run the whole unit with the fused Pallas backward (the conv
        bias is skipped there — IN is shift-invariant, so the bias is a
        mathematical no-op with an exactly-zero gradient)."""
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", torch_conv_kernel_init, (k, k, cin, self.features)
        )
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        if self.pad_mode == "reflect" and any(p for pr in pad for p in pr):
            x = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)), mode="reflect")
            pad = ((0, 0), (0, 0))
        dtype = self.dtype or x.dtype
        xc, kc = x.astype(dtype), kernel.astype(dtype)
        level = _conv_vjp_level()
        bound = 1.0 / math.sqrt(k * k * cin)
        if level:
            from msig_tpu.ops import conv3x3_vjp

            if conv3x3_vjp.supported(
                xc.shape, kernel.shape, self.strides, pad, self.pad_mode
            ):
                if adain_affine is not None and level >= 2:
                    # conv + IN + modulate as ONE custom_vjp unit: the IN
                    # backward runs inside the Pallas kernel (no XLA dy
                    # buffer). Bias: param still created (tree parity),
                    # mathematically absorbed by IN (zero grad).
                    if self.use_bias:
                        self.param("bias", _uniform_init(bound), (self.features,))
                    gamma, beta = adain_affine
                    unit = (conv3x3_vjp.relu_conv3x3_adain if self.pre_relu
                            else conv3x3_vjp.conv3x3_adain)
                    return unit(xc, kc, gamma, beta)
                # Level 1: fused Pallas backward (dx + dW in one data pass)
                # for the trunk's 3x3 sites — the train step's dominant
                # backward slab (ops/conv3x3_vjp.py).
                y = (conv3x3_vjp.relu_conv3x3(xc, kc) if self.pre_relu
                     else conv3x3_vjp.conv3x3_same(xc, kc))
                if self.use_bias:
                    bias = self.param("bias", _uniform_init(bound), (self.features,))
                    y = y + bias.astype(y.dtype)
                if adain_affine is not None:
                    from msig_tpu.ops.norm import adain_modulate

                    y = adain_modulate(y, *adain_affine,
                                       use_pallas=adain_use_pallas)
                return y
        if self.pre_relu:
            xc = jax.nn.relu(xc)
        y = jax.lax.conv_general_dilated(
            xc,
            kc,
            window_strides=(self.strides, self.strides),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", _uniform_init(bound), (self.features,))
            y = y + bias.astype(y.dtype)
        if adain_affine is not None:
            from msig_tpu.ops.norm import adain_modulate

            y = adain_modulate(y, *adain_affine, use_pallas=adain_use_pallas)
        return y


def _subpixel_conv_transpose_4_2_1(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Exact ConvTranspose2d(k=4, s=2, p=1) via phase decomposition.

    The dilated-input formulation spends 3/4 of its MACs multiplying the
    zeros inserted by stride-2 dilation. Decomposing into the four output
    phases — each a dense 2x2 convolution at *input* resolution, interleaved
    back with a depth-to-space reshape — computes the identical result with
    1/4 the FLOPs, all of it MXU-dense. Derivation (per spatial dim, with
    ``K`` the equivalent-forward-conv kernel stored by TorchConvTranspose):
    ``out[2t] = x[t-1]*K[0] + x[t]*K[2]`` and
    ``out[2t+1] = x[t]*K[1] + x[t+1]*K[3]``.
    """
    b, h, w, _ = x.shape
    dn = ("NHWC", "HWIO", "NHWC")

    def phase(sub_k, pad_h, pad_w):
        return jax.lax.conv_general_dilated(
            x, sub_k, (1, 1), (pad_h, pad_w), dimension_numbers=dn
        )

    o_ee = phase(kernel[0::2, 0::2], (1, 0), (1, 0))
    o_eo = phase(kernel[0::2, 1::2], (1, 0), (0, 1))
    o_oe = phase(kernel[1::2, 0::2], (0, 1), (1, 0))
    o_oo = phase(kernel[1::2, 1::2], (0, 1), (0, 1))
    cout = o_ee.shape[-1]
    # [B,H,W,C] x4 -> [B, H, 2, W, 2, C] -> [B, 2H, 2W, C]
    row_e = jnp.stack([o_ee, o_eo], axis=3)  # [B,H,W,2,C]
    row_o = jnp.stack([o_oe, o_oo], axis=3)
    out = jnp.stack([row_e, row_o], axis=2)  # [B,H,2,W,2,C]
    return out.reshape(b, 2 * h, 2 * w, cout)


class TorchConvTranspose(nn.Module):
    """Transposed conv with torch ``nn.ConvTranspose2d(k, s, p)`` semantics.

    Implemented as an input-dilated regular convolution: dilate the input by
    the stride, pad by ``k - 1 - p`` per side, then a VALID conv — this gives
    torch's output size ``(in-1)*s + k - 2p`` exactly (the generator's
    upsampling stages use k=4, s=2, p=1 → exact 2x, reference model.py:139-140).

    The stored kernel is HWIO for the *equivalent forward conv*. Importing a
    torch ``ConvTranspose2d`` weight ``W[cin, cout, kh, kw]`` requires
    ``kernel = flip(transpose(W, (2, 3, 0, 1)), axis=(0, 1))`` — see
    tools/import_torch_checkpoint.py.
    """

    features: int
    kernel_size: int
    strides: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    # Phase-decomposed path (exact, 1/4 the nominal FLOPs) — measured SLOWER
    # than XLA's dilated lowering on TPU v5e (the interleave reshuffle costs
    # more than the zero-MACs XLA already avoids), so off by default.
    subpixel: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        cin = x.shape[-1]

        def kernel_init(key, shape, dtype=jnp.float32):
            # torch convT fan_in = cout * kh * kw (weight dim 1 is cout)
            bound = 1.0 / math.sqrt(self.features * k * k)
            return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

        kernel = self.param("kernel", kernel_init, (k, k, cin, self.features))
        dtype = self.dtype or x.dtype
        if self.subpixel and k == 4 and self.strides == 2 and self.padding == 1:
            y = _subpixel_conv_transpose_4_2_1(x.astype(dtype), kernel.astype(dtype))
        else:
            p = k - 1 - self.padding
            y = jax.lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                window_strides=(1, 1),
                padding=((p, p), (p, p)),
                lhs_dilation=(self.strides, self.strides),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bound = 1.0 / math.sqrt(self.features * k * k)
            bias = self.param("bias", _uniform_init(bound), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class TorchDense(nn.Module):
    """Linear layer with torch ``nn.Linear`` default init."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param("kernel", torch_dense_kernel_init, (cin, self.features))
        dtype = self.dtype or x.dtype
        y = jnp.matmul(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bound = 1.0 / math.sqrt(cin)
            bias = self.param("bias", _uniform_init(bound), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)
