"""Int8 quantized generator forward (inference-only, opt-in).

TPU v5e executes int8 MXU contractions at 2x the bf16 rate (394 vs 197
TOPS). The generator's structure makes int8 inference unusually clean: every
convolution except the final RGB projection is immediately followed by an
instance norm (plain IN or AdaIN). Per-channel instance normalization
absorbs, *exactly*:

  - per-output-channel weight-quantization scales  (IN(s_c * y_c) = IN(y_c)),
  - per-sample scalar activation-quantization scales,
  - convolution biases (constant per channel over space — removed by the
    mean subtraction; they are mathematically dead in the reference too),
  - the input normalization (x/127.5 - 1): the shift becomes a per-channel
    constant after the first conv and the scale is uniform.

So the quantized path runs int8 conv -> int32 -> AdaIN/IN in fp32 -> ReLU
-> dynamic per-sample requant to int8 -> next conv, with NO dequantization
arithmetic anywhere. The only remaining quantization error is the rounding
of weights and activations to 8 bits (measured: >35 dB PSNR vs the fp32
path on random weights; see tests/test_quantized.py).

The final reflect conv7 -> tanh is kept in bf16 (it is not IN-followed, and
its FLOPs are negligible).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from msig_tpu.ops.norm import adain_modulate, instance_norm

_DN = ("NHWC", "HWIO", "NHWC")


def _quantize_kernel(w: jax.Array) -> jax.Array:
    """fp32 HWIO kernel -> int8, per-output-channel symmetric. Scales and the
    bias are dropped entirely — absorbed by the following instance norm."""
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    return jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)


def quantize_generator_params(params: Dict[str, Any], n_residual_blocks: int) -> Dict[str, Any]:
    """Precompute int8 kernels for all IN-followed convs of the generator."""
    p = params["params"]
    q: Dict[str, Any] = {}
    for name in ("enc_conv0", "enc_conv1", "enc_conv2", "dec_up0", "dec_up1"):
        q[name] = _quantize_kernel(p[name]["kernel"])
    for i in range(n_residual_blocks):
        rb = p[f"resblock{i}"]
        q[f"res{i}_conv1"] = _quantize_kernel(rb["conv1"]["kernel"])
        q[f"res{i}_conv2"] = _quantize_kernel(rb["conv2"]["kernel"])
        for a in ("adain1", "adain2"):
            sm = rb[a]["style_mod"]
            q[f"res{i}_{a}_k"] = sm["kernel"]
            q[f"res{i}_{a}_b"] = sm["bias"]
    # Final conv is NOT IN-followed: quantize with explicit per-out-channel
    # weight scales for a true dequant before tanh.
    wout = jnp.asarray(p["dec_conv_out"]["kernel"], jnp.float32)
    wamax = jnp.max(jnp.abs(wout), axis=(0, 1, 2))
    ws = jnp.where(wamax > 0, wamax / 127.0, 1.0)
    q["out_kernel_i8"] = jnp.clip(jnp.round(wout / ws), -127, 127).astype(jnp.int8)
    q["out_wscale"] = ws
    q["out_bias"] = p["dec_conv_out"]["bias"]
    return q


def _requant(x: jax.Array) -> jax.Array:
    """bf16 activations -> int8 with a per-sample dynamic scalar scale
    (factored out by the next conv's following IN, so never dequantized)."""
    amax = jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True).astype(jnp.float32)
    scale = jnp.where(amax > 0, 127.0 / amax, 1.0).astype(x.dtype)
    return jnp.clip(jnp.round((x * scale).astype(jnp.float32)), -127, 127).astype(jnp.int8)


def _requant_with_inv_scale(x: jax.Array):
    """Like _requant but also returns the inverse scale for a true dequant
    (used before the final, non-IN-followed conv)."""
    amax = jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True).astype(jnp.float32)
    scale = jnp.where(amax > 0, 127.0 / amax, 1.0)
    xi = jnp.clip(
        jnp.round((x * scale.astype(x.dtype)).astype(jnp.float32)), -127, 127
    ).astype(jnp.int8)
    return xi, 1.0 / scale


def _conv_i8(x_i8: jax.Array, w_i8: jax.Array, stride: int, pad, lhs_dilation=None) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x_i8,
        w_i8,
        window_strides=(stride, stride),
        padding=pad,
        lhs_dilation=lhs_dilation,
        dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )


def _style_affine(style, k, b):
    params = jnp.matmul(style.astype(jnp.float32), k) + b
    gamma, beta = jnp.split(params, 2, axis=-1)
    return gamma, beta


def quantized_generator_apply(
    q: Dict[str, Any],
    img_u8: jax.Array,
    style: jax.Array,
    n_res: int = 8,
    out_dtype=jnp.float32,
    fused_epilogue: bool = False,
) -> jax.Array:
    """Full int8 generator forward: uint8 NHWC image + style -> [-1,1] image.

    Mirrors StyleCycleGANGenerator.__call__ (msig_tpu/models/networks.py)
    with int8 convolutions; see module docstring for why no dequant scales
    or biases appear.
    """
    # Raw uint8 -> int8 by recentering; the affine (x/127.5 - 1) is absorbed.
    x = (img_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    h = _conv_i8(x, q["enc_conv0"], 1, ((0, 0), (0, 0)))
    h = jnp.maximum(instance_norm(h.astype(jnp.bfloat16)), 0)
    h = _conv_i8(_requant(h), q["enc_conv1"], 2, ((1, 1), (1, 1)))
    h = jnp.maximum(instance_norm(h.astype(jnp.bfloat16)), 0)
    h = _conv_i8(_requant(h), q["enc_conv2"], 2, ((1, 1), (1, 1)))
    h = jnp.maximum(instance_norm(h.astype(jnp.bfloat16)), 0)

    from msig_tpu.ops import int8_epilogue_chunked

    bsz, hh, ww, cc = h.shape
    use_fused = fused_epilogue and int8_epilogue_chunked.supported((bsz, hh * ww, cc))
    if use_fused:
        # Chunked two-phase Pallas epilogue for the relu (adain1) sites —
        # stats + exact amax in one pipelined sweep, requant in a second
        # (ops/int8_epilogue_chunked.py); adain2 + residual stays on XLA.
        for i in range(n_res):
            g1, b1 = _style_affine(style, q[f"res{i}_adain1_k"], q[f"res{i}_adain1_b"])
            g2, b2 = _style_affine(style, q[f"res{i}_adain2_k"], q[f"res{i}_adain2_b"])
            y = _conv_i8(_requant(h), q[f"res{i}_conv1"], 1, ((1, 1), (1, 1)))
            y_i8 = int8_epilogue_chunked.adain_relu_requant_chunked(
                y.reshape(bsz, hh * ww, cc), g1, b1
            ).reshape(bsz, hh, ww, cc)
            y2 = _conv_i8(y_i8, q[f"res{i}_conv2"], 1, ((1, 1), (1, 1)))
            y2 = adain_modulate(y2.astype(jnp.bfloat16), g2, b2)
            h = y2 + h
    else:
        for i in range(n_res):
            g1, b1 = _style_affine(style, q[f"res{i}_adain1_k"], q[f"res{i}_adain1_b"])
            g2, b2 = _style_affine(style, q[f"res{i}_adain2_k"], q[f"res{i}_adain2_b"])
            y = _conv_i8(_requant(h), q[f"res{i}_conv1"], 1, ((1, 1), (1, 1)))
            y = jnp.maximum(adain_modulate(y.astype(jnp.bfloat16), g1, b1), 0)
            y = _conv_i8(_requant(y), q[f"res{i}_conv2"], 1, ((1, 1), (1, 1)))
            y = adain_modulate(y.astype(jnp.bfloat16), g2, b2)
            h = y + h

    h = _conv_i8(_requant(h), q["dec_up0"], 1, ((2, 2), (2, 2)), lhs_dilation=(2, 2))
    h = jnp.maximum(instance_norm(h.astype(jnp.bfloat16)), 0)
    h = _conv_i8(_requant(h), q["dec_up1"], 1, ((2, 2), (2, 2)), lhs_dilation=(2, 2))
    h = jnp.maximum(instance_norm(h.astype(jnp.bfloat16)), 0)

    # Final RGB conv in int8 with a true dequant (not IN-followed), then tanh.
    hi, inv_s = _requant_with_inv_scale(h)
    hi = jnp.pad(hi, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    y = _conv_i8(hi, q["out_kernel_i8"], 1, ((0, 0), (0, 0)))
    yf = y.astype(jnp.float32) * (q["out_wscale"][None, None, None, :] * inv_s)
    return jnp.tanh(yf + q["out_bias"]).astype(out_dtype)
