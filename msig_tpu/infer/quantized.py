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

import os
from typing import Any, Dict, Tuple

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
    # Packed [9C, C] trunk weights for the fused Pallas conv kernels
    # (ops/fused_conv_int8.py); tiny, always precomputed.
    from msig_tpu.ops import fused_conv_int8 as _fc

    for i in range(n_residual_blocks):
        q[f"res{i}_conv1_p"] = _fc.pack_weights(q[f"res{i}_conv1"])
        q[f"res{i}_conv2_p"] = _fc.pack_weights(q[f"res{i}_conv2"])
    # Opt-in v3 single-kernel trunk: its stacked weight slab duplicates all
    # 16 packed trunk weights (~9.4 MB HBM) — only built when the flag that
    # selects the consumer is set (the variant measured SLOWER and ships off;
    # docs/PERF.md "v3 single-kernel trunk").
    if os.environ.get("MSIG_TRUNK_V3", "0") == "1":
        from msig_tpu.ops import fused_trunk_v3 as _f3

        q["trunk_w_stack"] = _f3.pack_trunk_weights(q, n_residual_blocks)
    # NOTE: the v1 packed ConvT weights (pack_convt_weights -> "up0_p"/
    # "up1_p") are NOT built here — the shipping decoder reads only the
    # phase-split "up0_ps"/"up1_ps"; measurement tools that exercise the v1
    # kernels pack locally (tools/profile_fused_stages.py).
    cu0 = q["dec_up0"].shape[2]
    cu1 = q["dec_up1"].shape[2]
    from msig_tpu.ops import fused_conv_int8_v2 as _f2

    q["up0_ps"], _ = _f2.pack_convt_weights_ps(
        q["dec_up0"], cu0, q["dec_up0"].shape[3])
    q["up1_ps"], _ = _f2.pack_convt_weights_ps(
        q["dec_up1"], cu1, q["dec_up1"].shape[3])
    # Fused Pallas encoder (256^2 trunk path only; harmless tiny extras)
    if (q["enc_conv0"].shape == (7, 7, 3, 64)
            and q["enc_conv1"].shape == (4, 4, 64, 128)
            and q["enc_conv2"].shape == (4, 4, 128, 256)):
        from msig_tpu.ops import fused_enc_int8 as _fe
        import numpy as _np

        q["enc0_p"] = _fe.pack_enc0(_np.asarray(q["enc_conv0"]))
        q["enc1_p"] = _fe.pack_enc1(_np.asarray(q["enc_conv1"]))
        if os.environ.get("MSIG_ENC1_IM2COL", "0") == "1":
            # Opt-in variant; measured slower than phase-packed
            # (docs/PERF.md "enc1 dense-K im2col").
            q["enc1_i2c_p"] = _fe.pack_enc1_im2col(_np.asarray(q["enc_conv1"]))
        q["enc2_p"] = _fe.pack_enc2(_np.asarray(q["enc_conv2"]))
    # Final conv is NOT IN-followed: quantize with explicit per-out-channel
    # weight scales for a true dequant before tanh.
    wout = jnp.asarray(p["dec_conv_out"]["kernel"], jnp.float32)
    wamax = jnp.max(jnp.abs(wout), axis=(0, 1, 2))
    ws = jnp.where(wamax > 0, wamax / 127.0, 1.0)
    w_i8 = jnp.clip(jnp.round(wout / ws), -127, 127).astype(jnp.int8)
    # Fully-fused decoder tail (up1-on-s2d + final conv7+tanh+uint8 kernels)
    if q["dec_up1"].shape == (4, 4, 128, 64) and w_i8.shape == (7, 7, 64, 3):
        from msig_tpu.ops import fused_dec_int8 as _fd
        import numpy as _np2

        q["up1_s16"] = _fd.pack_up1_s2d16(_np2.asarray(q["dec_up1"]))
        q["final_s16"] = _fd.pack_final_s2d16(_np2.asarray(w_i8))
    # Pad C_out 3 -> 8: XLA's int8 conv is 2.3x faster on the padded shape
    # (sub-lane output widths hit a slow path; measured 18.4 -> 8.1 ms at
    # B=128). The 5 zero channels are sliced off after the conv.
    q["out_kernel_i8"] = jnp.pad(w_i8, ((0, 0), (0, 0), (0, 0), (0, 5)))
    q["out_wscale"] = jnp.pad(ws, (0, 5), constant_values=1.0)
    q["out_bias"] = jnp.pad(p["dec_conv_out"]["bias"], (0, 5))
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


def _fused_trunk_rows(q, hq, hs, style, n_res, w_img=64, v3: bool | None = None,
                      hifi: bool | None = None):
    """Resblock trunk on an already-quantized padded-row slab (v2 layout).

    Default: the round-2 per-site chain (one kernel per conv site,
    ops/fused_conv_int8_v2.py). ``v3=True`` (or MSIG_TRUNK_V3=1) runs the
    ENTIRE trunk as ONE Pallas kernel (ops/fused_trunk_v3.py) — measured
    SLOWER on v5e (43.9 vs 40.9 ms at B=128: Mosaic does not overlap the
    interleaved requant with the next site's matmuls across the scratch
    dependency), so it is kept only as an opt-in reference.
    """
    from msig_tpu.ops import fused_conv_int8_v2 as fc
    from msig_tpu.ops import fused_trunk_v3 as f3

    if v3 is None:
        v3 = w_img == 64 and os.environ.get("MSIG_TRUNK_V3", "0") == "1"
    if v3 and hifi is not False and os.environ.get("MSIG_TRUNK_HIFI", "0") != "0":
        # The v3 single-kernel trunk has no bf16 residual carry: taking the
        # v3 branch below would silently drop the requested quality mode.
        import warnings

        warnings.warn(
            "MSIG_TRUNK_V3=1 and MSIG_TRUNK_HIFI=1 are both set; the v3 "
            "trunk has no hi-fi residual carry, so MSIG_TRUNK_V3 is being "
            "IGNORED in favor of the quality mode.", stacklevel=2)
        v3 = False

    # Hoist ALL style affines into one batched matmul up front so the
    # Pallas sites run back-to-back with no interleaved XLA launches.
    ks = jnp.stack([q[f"res{i}_{a}_k"] for i in range(n_res)
                    for a in ("adain1", "adain2")])          # [2n, S, 2C]
    bs = jnp.stack([q[f"res{i}_{a}_b"] for i in range(n_res)
                    for a in ("adain1", "adain2")])          # [2n, 2C]
    if v3 and "trunk_w_stack" in q:
        params = jnp.einsum("bs,nsc->bnc", style.astype(jnp.float32), ks) \
            + bs[None, :, :]
        gammas, betas = jnp.split(params, 2, axis=-1)        # [B, 2n, C]
        hq, _ = f3.fused_trunk_blocks(
            hq, hs, q["trunk_w_stack"], gammas, betas, n_res, w_img=w_img)
        return hq
    params = jnp.einsum("bs,nsc->nbc", style.astype(jnp.float32), ks) + bs[:, None, :]
    gammas, betas = jnp.split(params, 2, axis=-1)            # [2n, B, C] each

    if hifi is None:
        # Quality modes for the inter-block residual carry
        # (MSIG_TRUNK_HIFI, default 0 = stock int8+scale carry, 37.2 dB):
        #   1 = bf16 carry (conv3x3_adain_residual_hifi): +1.5 dB PSNR on
        #       TPU (38.7 vs 37.2; CPU-interpret attribution measured 38.4)
        #       at ~0.7% slower @B=128 / ~2.6% @B=256 (results/logs/
        #       r5_full/bench_256{,_nohifi}.log) — writes int8 conv copy +
        #       bf16 residual = 3 B/elem between blocks.
        #   2 = 2x-int8 error-plane carry (conv3x3_adain_residual_hifi2,
        #       VERDICT r4 #2): ~15-bit residual at 2 B/elem — hi-fi
        #       fidelity at roughly half the bf16 carry's traffic tax.
        # Defaults and the measured table live in docs/PERF.md.
        hifi = os.environ.get("MSIG_TRUNK_HIFI", "0")
        hifi = int(hifi) if hifi in ("0", "1", "2") else 1
    elif hifi is True:
        hifi = 1
    if hifi == 2:
        # Error-plane residual carry: (h1 + h2/254) * hs, h1 doubles as the
        # next conv1's int8 input — see fc._kernel_res_hifi2.
        h2 = jnp.zeros_like(hq)
        hs_b = hs.reshape(-1, 1, 1).astype(jnp.float32)
        for i in range(n_res):
            y1q = fc.conv3x3_adain_relu_requant(
                hq, q[f"res{i}_conv1_p"], gammas[2 * i], betas[2 * i],
                w_img=w_img)
            hq, h2, hs_b = fc.conv3x3_adain_residual_hifi2(
                y1q, hq, h2, hs_b, q[f"res{i}_conv2_p"], gammas[2 * i + 1],
                betas[2 * i + 1], w_img=w_img)
        return hq
    if hifi:
        # Hi-fi residual carry: the inter-block residual stream stays bf16
        # (only conv INPUTS are int8), closing the trunk's share of the
        # all-Pallas PSNR gap — see fc.conv3x3_adain_residual_hifi.
        hb = hq.astype(jnp.bfloat16) * hs.reshape(-1, 1, 1).astype(jnp.bfloat16)
        for i in range(n_res):
            y1q = fc.conv3x3_adain_relu_requant(
                hq, q[f"res{i}_conv1_p"], gammas[2 * i], betas[2 * i],
                w_img=w_img)
            hq, hb = fc.conv3x3_adain_residual_hifi(
                y1q, hb, q[f"res{i}_conv2_p"], gammas[2 * i + 1],
                betas[2 * i + 1], w_img=w_img)
        return hq
    for i in range(n_res):
        y1q = fc.conv3x3_adain_relu_requant(
            hq, q[f"res{i}_conv1_p"], gammas[2 * i], betas[2 * i], w_img=w_img)
        hq, hs = fc.conv3x3_adain_residual_requant(
            y1q, hq, hs, q[f"res{i}_conv2_p"], gammas[2 * i + 1],
            betas[2 * i + 1], w_img=w_img)
    # int8 + absorbed scale is exactly what the following conv expects;
    # rows stay guard-padded so the fused decoder can chain directly.
    return hq


def _fused_trunk(q, h, style, n_res):
    """bf16-input wrapper for :func:`_fused_trunk_rows` (XLA-encoder path)."""
    from msig_tpu.ops import fused_conv_int8_v2 as fc

    bsz = h.shape[0]
    hq, inv_s = _requant_with_inv_scale(h)
    hq = fc.to_padded_rows(hq)
    hs = inv_s.reshape(bsz, 1).astype(jnp.float32)
    return _fused_trunk_rows(q, hq, hs, style, n_res, w_img=h.shape[2])


def _fused_encoder(q, img_u8):
    """uint8 image -> (trunk-ready int8 slab, residual scale [B,1]).

    Entire encoder as three Pallas kernels on the shared 64-grid layout
    (ops/fused_enc_int8.py) — no XLA convs, int8-only HBM traffic. At
    512^2 the same kernels run on the 128-grid (enc0 HBM-staged).
    """
    from msig_tpu.ops import fused_enc_int8 as fe

    w_cells = img_u8.shape[1] // 4
    slab = fe.prep_s2d4_input(img_u8)
    h0 = fe.enc0_in_relu_requant(slab, q["enc0_p"], w_cells=w_cells)
    if os.environ.get("MSIG_ENC1_IM2COL", "0") == "1" and "enc1_i2c_p" in q:
        # Dense-K enc1 (2.25x fewer MACs) — opt-in pending TPU measurement.
        h1 = fe.enc1_in_relu_requant_im2col(h0, q["enc1_i2c_p"],
                                            w_cells=w_cells)
    else:
        h1 = fe.enc1_in_relu_requant(h0, q["enc1_p"], w_cells=w_cells)
    hq, inv_s = fe.enc2_in_relu_requant(h1, q["enc2_p"], w_cells=w_cells)
    return hq, inv_s.reshape(img_u8.shape[0], 1)


def _fused_decoder(q, hq_rows, out_dtype, w_cells: int = 64):
    """dec_up0 -> dec_up1 -> final conv, all int8, all fused Pallas sites.

    uint8 output (the serving path): up0 emits a guard-padded s2d slab, up1
    consumes it DIRECTLY on the cell grid (ops/fused_dec_int8 — no XLA
    un-phase between the sites; HBM-staged at the 128-grid where the int32
    slab exceeds VMEM), a cheap reflect guard fill replaces
    ReflectionPad2d, and one final kernel fuses conv7 + dequant + tanh +
    the uint8 serving conversion. Float output falls back to the round-2
    structure (phase-split up sites + XLA final conv).
    """
    from msig_tpu.ops import fused_conv_int8_v2 as fc

    if out_dtype == jnp.uint8 and "up1_s16" in q:
        from msig_tpu.ops import fused_dec_int8 as fd

        y0, _ = fc.convt4x4s2_in_relu_requant_ps(
            hq_rows, q["up0_ps"], fc.PS_TAPS, w_cells, guarded_out=True)
        if w_cells > 64:
            y1, inv_s = fd.up1_s2d16_hbm(y0, q["up1_s16"], w_cells=w_cells)
        else:
            y1, inv_s = fd.up1_s2d16(y0, q["up1_s16"])
        u8 = fd.final7_tanh_u8(y1, q["final_s16"], q["out_wscale"],
                               q["out_bias"], inv_s, w_cells=w_cells)
        return fd.unphase_s2d16_u8(u8, w_cells=w_cells)

    b = hq_rows.shape[0]
    c1 = q["dec_up1"].shape[2]   # 128
    c2 = q["dec_up1"].shape[3]   # 64
    y0, _ = fc.convt4x4s2_in_relu_requant_ps(
        hq_rows, q["up0_ps"], fc.PS_TAPS, w_cells)
    y0 = fc.to_padded_rows(fc.unphase_s2d(y0, w_cells, c1))
    y1, inv_s = fc.convt4x4s2_in_relu_requant_ps(
        y0, q["up1_ps"], fc.PS_TAPS, 2 * w_cells)
    h64 = fc.unphase_s2d(y1, 2 * w_cells, c2)
    hi = jnp.pad(h64, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    y = _conv_i8(hi, q["out_kernel_i8"], 1, ((0, 0), (0, 0)))[..., :3]
    yf = y.astype(jnp.float32) * (
        q["out_wscale"][None, None, None, :3] * inv_s.reshape(b, 1, 1, 1))
    return _to_out_dtype(jnp.tanh(yf + q["out_bias"][:3]), out_dtype)


def quantized_generator_apply(
    q: Dict[str, Any],
    img_u8: jax.Array,
    style: jax.Array,
    n_res: int = 8,
    out_dtype=jnp.float32,
    fused_epilogue: bool = False,
    fused_trunk: bool | None = None,
) -> jax.Array:
    """Full int8 generator forward: uint8 NHWC image + style -> [-1,1] image.

    Mirrors StyleCycleGANGenerator.__call__ (msig_tpu/models/networks.py)
    with int8 convolutions; see module docstring for why no dequant scales
    or biases appear.
    """
    if fused_trunk is None:
        # Auto: the Pallas kernels win on real TPU hardware; on CPU they
        # would run in the interpreter, so default off there.
        fused_trunk = jax.default_backend() in ("tpu", "axon")

    all_pallas = fused_trunk and "enc0_p" in q and (
        img_u8.shape[1:] == (256, 256, 3)
        # 512^2 only on the uint8 serving path: the float fallback decoder
        # would need a w_img=256 ConvT whose scratch slab exceeds VMEM.
        or (img_u8.shape[1:] == (512, 512, 3) and out_dtype == jnp.uint8
            and "up1_s16" in q
            # kill-switch for the first real-TPU runs of the HBM-staged
            # kernels: MSIG_512_FUSED=0 falls back to the XLA decoder.
            and os.environ.get("MSIG_512_FUSED", "1") == "1"))
    if all_pallas:
        # All-Pallas path: fused encoder -> fused trunk -> fused decoder
        # (64-grid at 256^2, 128-grid at 512^2 with HBM-staged enc0/up1).
        w_cells = img_u8.shape[1] // 4
        hq_rows, hs = _fused_encoder(q, img_u8)
        hq_rows = _fused_trunk_rows(q, hq_rows, hs, style, n_res,
                                    w_img=w_cells)
        return _fused_decoder(q, hq_rows, out_dtype, w_cells=w_cells)

    h = _xla_encoder(q, img_u8)
    bsz, hh, ww, cc = h.shape
    if fused_trunk and hh == ww == 64 and cc % 128 == 0:
        hq_rows = _fused_trunk(q, h, style, n_res)
        return _fused_decoder(q, hq_rows, out_dtype)
    if fused_trunk and hh == ww == 128 and cc % 128 == 0:
        # 512^2 input: fused trunk on 128x128 maps, then the fused decoder
        # on the 128-cell grid for the uint8 serving path — up1 runs as the
        # HBM-staged kernel pair (the int32 acc slab at 17408x1024 rows
        # exceeds VMEM; ops/fused_dec_int8.up1_s2d16_hbm). Float output
        # keeps the XLA decoder.
        from msig_tpu.ops import fused_conv_int8_v2 as _f2

        hq_rows = _fused_trunk(q, h, style, n_res)
        if (out_dtype == jnp.uint8 and "up1_s16" in q
                and os.environ.get("MSIG_512_FUSED", "1") == "1"):
            from msig_tpu.ops import fused_dec_int8 as _fd

            y0, _ = _f2.convt4x4s2_in_relu_requant_ps(
                hq_rows, q["up0_ps"], _f2.PS_TAPS, 128, guarded_out=True)
            y1, inv_s = _fd.up1_s2d16_hbm(y0, q["up1_s16"], w_cells=128)
            u8 = _fd.final7_tanh_u8(y1, q["final_s16"], q["out_wscale"],
                                    q["out_bias"], inv_s, w_cells=128)
            return _fd.unphase_s2d16_u8(u8, w_cells=128)
        # int8 with an absorbed per-sample scale — exactly what the next
        # IN-followed conv expects; skip the dequant/requant round trip.
        return _xla_decoder(q, _rows_to_body(hq_rows, hh), out_dtype,
                            int8_body=True)

    h = _xla_trunk(q, h, style, n_res, fused_epilogue=fused_epilogue)
    return _xla_decoder(q, h, out_dtype)


def _xla_encoder(q, img_u8):
    """uint8 image -> post-IN-relu bf16 encoder output (XLA int8 convs)."""
    # Raw uint8 -> int8 by recentering; the affine (x/127.5 - 1) is absorbed.
    x = (img_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    h = _conv_i8(x, q["enc_conv0"], 1, ((0, 0), (0, 0)))
    h = jnp.maximum(instance_norm(h.astype(jnp.bfloat16)), 0)
    h = _conv_i8(_requant(h), q["enc_conv1"], 2, ((1, 1), (1, 1)))
    h = jnp.maximum(instance_norm(h.astype(jnp.bfloat16)), 0)
    h = _conv_i8(_requant(h), q["enc_conv2"], 2, ((1, 1), (1, 1)))
    return jnp.maximum(instance_norm(h.astype(jnp.bfloat16)), 0)


def _xla_trunk(q, h, style, n_res, fused_epilogue: bool = False):
    """bf16 trunk input -> bf16 trunk output (XLA int8 resblock convs)."""
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
    return h


def _xla_decoder(q, h, out_dtype, int8_body: bool = False):
    """Trunk output -> final image (XLA int8 ConvT + final conv).

    ``int8_body=True`` means ``h`` is already an int8 body with an
    absorbed per-sample scale (e.g. straight out of the fused trunk) —
    dec_up0 is IN-followed, so it consumes that directly."""
    h = _conv_i8(h if int8_body else _requant(h), q["dec_up0"], 1,
                 ((2, 2), (2, 2)), lhs_dilation=(2, 2))
    h = jnp.maximum(instance_norm(h.astype(jnp.bfloat16)), 0)
    h = _conv_i8(_requant(h), q["dec_up1"], 1, ((2, 2), (2, 2)), lhs_dilation=(2, 2))
    h = jnp.maximum(instance_norm(h.astype(jnp.bfloat16)), 0)

    # Final RGB conv in int8 with a true dequant (not IN-followed), then tanh.
    return _final_conv(q, h, out_dtype)


def _rows_to_body(hq_rows, side: int):
    """Padded-row int8 slab -> spatial int8 body [B, side, side, C].

    The single point of truth for undoing the v2 guard/wp row packing
    (used by the staged hybrids and the 512^2 float fallback)."""
    from msig_tpu.ops import fused_conv_int8_v2 as fc

    b, c = hq_rows.shape[0], hq_rows.shape[-1]
    g = fc.guard_rows(side)
    wp = side + 8
    return hq_rows[:, g:g + side * wp].reshape(b, side, wp, c)[:, :, :side]


def _rows_to_spatial(hq_rows, hs, side: int):
    """Inverse of ``_fused_trunk``'s packing: padded-row int8 slab + per-
    sample inverse scale -> bf16 spatial activations [B, side, side, C]."""
    body = _rows_to_body(hq_rows, side)
    b = body.shape[0]
    return body.astype(jnp.bfloat16) * hs.reshape(b, 1, 1, 1).astype(jnp.bfloat16)


def quantized_generator_apply_staged(
    q: Dict[str, Any],
    img_u8: jax.Array,
    style: jax.Array,
    n_res: int = 8,
    out_dtype=jnp.float32,
    pallas: Tuple[str, ...] = ("enc", "trunk", "dec"),
) -> jax.Array:
    """Per-stage Pallas/XLA composition of the int8 generator.

    ``pallas`` selects which of the three stages run on the fused Pallas
    kernels; the rest run the XLA int8 path. Used to ATTRIBUTE accuracy
    differences between the all-Pallas path and the int8 XLA path to a
    single stage (tools/check_psnr_tpu.py, VERDICT r3 directive #3): each
    hybrid swaps exactly one stage, so a PSNR drop names its kernel.

    256^2 only (the attribution target); the production entry point is
    :func:`quantized_generator_apply`.
    """
    from msig_tpu.ops import fused_conv_int8_v2 as fc

    side = img_u8.shape[1] // 4

    if "enc" in pallas:
        hq_rows, hs = _fused_encoder(q, img_u8)
        if "trunk" not in pallas:
            h = _rows_to_spatial(hq_rows, hs, side)
    else:
        h = _xla_encoder(q, img_u8)

    if "trunk" in pallas:
        if "enc" not in pallas:
            hq, inv_s = _requant_with_inv_scale(h)
            hq_rows = fc.to_padded_rows(hq)
            hs = inv_s.reshape(h.shape[0], 1).astype(jnp.float32)
        hq_rows = _fused_trunk_rows(q, hq_rows, hs, style, n_res, w_img=side)
        if "dec" not in pallas:
            # Trunk rows carry an absorbed per-sample scale (hs is the
            # ENCODER residual scale, consumed inside the trunk); the XLA
            # decoder's dec_up0 is IN-followed, so int8 + absorbed scale is
            # exactly what it expects (same contract as the 512^2 float
            # fallback in quantized_generator_apply).
            return _xla_decoder(q, _rows_to_body(hq_rows, side), out_dtype,
                                int8_body=True)
    else:
        h = _xla_trunk(q, h, style, n_res)
        if "dec" in pallas:
            hq, inv_s = _requant_with_inv_scale(h)
            hq_rows = fc.to_padded_rows(hq)

    if "dec" in pallas:
        return _fused_decoder(q, hq_rows, out_dtype, w_cells=side)
    return _xla_decoder(q, h, out_dtype)


def _final_conv(q, h, out_dtype):
    """Requant -> reflect-pad -> int8 conv7 (C_out padded to 8) -> tanh."""
    hi, inv_s = _requant_with_inv_scale(h)
    hi = jnp.pad(hi, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    y = _conv_i8(hi, q["out_kernel_i8"], 1, ((0, 0), (0, 0)))[..., :3]
    yf = y.astype(jnp.float32) * (q["out_wscale"][None, None, None, :3] * inv_s)
    return _to_out_dtype(jnp.tanh(yf + q["out_bias"][:3]), out_dtype)


def _to_out_dtype(y, out_dtype):
    """[-1,1] float -> out_dtype; uint8 means the [0,255] serving image."""
    if out_dtype == jnp.uint8:
        return jnp.clip(jnp.round((y + 1.0) * 127.5), 0, 255).astype(jnp.uint8)
    return y.astype(out_dtype)
