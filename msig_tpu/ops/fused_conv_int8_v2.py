"""v2 fused int8 conv kernels: padded-column layout, per-tap MXU accumulation.

Differences vs ops/fused_conv_int8.py (v1):

  * Layout: the H x W x C feature map is stored as ``[H * WP, C]`` with
    WP = W + 8 — eight zero guard COLUMNS per image row — plus the usual
    zero guard ROWS top/bottom. A 3x3 tap offset becomes ``dy*WP + dx`` and
    horizontal edge taps now read the zero guard columns, so NO edge
    masking is needed anywhere in the convolution.
  * The 9 taps are 9 direct shifted-slice ``dot_general``s accumulated in
    int32 — the v1 ``[CHUNK, 9C]`` im2col scratch copy (a full extra
    VMEM write+read of the operand, serialized on the VPU) is gone.
  * Cost: conv outputs are also computed at the 8 guard columns
    (+12.5% MXU rows); instance-norm statistics and the requantized
    stores mask them out with a static ``j mod WP < W`` predicate.

Numerics are identical to v1 (tests/test_fused_conv_int8.py::test_v2_*).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
GUARD = 128  # guard rows for w_img=64 (kept as a constant for that case)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def guard_rows(w_img: int) -> int:
    """Zero guard rows top/bottom: >= WP+1, rounded up to a 32-row tile."""
    wp = w_img + 8
    return max(128, ((wp + 1 + 31) // 32) * 32)


def geometry(w_img: int, chunk_rows: int = 16):
    """(WP, SROWS_P, chunk, n_chunks) for a w_img x w_img map."""
    wp = w_img + 8
    srows = w_img * wp
    # chunk_rows image rows per chunk; 16 keeps the operand ~[1152..2304, C]
    chunk = chunk_rows * wp
    assert srows % chunk == 0
    return wp, srows, chunk, srows // chunk


def to_padded_rows(x: jax.Array) -> jax.Array:
    """[B, H, W, C] int8 -> [B, g + H*WP + g, C] guard-padded rows."""
    b, h, w, c = x.shape
    wp = w + 8
    g = guard_rows(w)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 8), (0, 0)))
    x = x.reshape(b, h * wp, c)
    return jnp.pad(x, ((0, 0), (g, g), (0, 0)))


def _valid_mask(chunk: int, wp: int, w_img: int):
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) % wp
    return j < w_img


def _stats_update_slim(yc, valid, sums, sumsq, cmin, cmax):
    """Slim per-chunk IN-stats update: ~7 VPU ops/element (was ~9).

    min/max track the zero-masked ``xf`` directly instead of re-masking
    with +/-inf, so cmin<=0<=cmax per channel. The derived requant amax is
    exact whenever a channel's conv outputs straddle zero (essentially
    always post-conv); otherwise it is a slight OVERestimate — a slightly
    smaller scale, never clipping. PSNR-gated (tools/check_psnr_tpu.py).

    Round-3 measured dead end, recorded: offloading sum/sumsq to skinny
    fp32 MXU matmuls REGRESSED every kernel (enc2 4.8 -> 8.3 ms, trunk
    40.9 -> 43.3 at B=128) — interleaving fp32 matmuls into the int8 conv
    stream stalls the MXU on mode switches. Reductions stay on the VPU.
    """
    xf = jnp.where(valid, yc.astype(jnp.float32), 0.0)
    sums = sums + jnp.sum(xf, axis=0, keepdims=True)
    sumsq = sumsq + jnp.sum(xf * xf, axis=0, keepdims=True)
    cmin = jnp.minimum(cmin, jnp.min(xf, axis=0, keepdims=True))
    cmax = jnp.maximum(cmax, jnp.max(xf, axis=0, keepdims=True))
    return sums, sumsq, cmin, cmax


def _conv_chunk(x_ref, w_ref, cin, cout, start, offs, chunk):
    """Accumulate the 9 shifted-slice matmuls for one output chunk."""
    acc = None
    for t, off in enumerate(offs):
        lhs = x_ref[0, pl.ds(start + off, chunk), :]
        d = jax.lax.dot_general(
            lhs, w_ref[t * cin:(t + 1) * cin, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = d if acc is None else acc + d
    return acc


def _kernel_relu(eps, cin, wp, w_img, srows, chunk, guard,
                 x_ref, w_ref, g_ref, b_ref, o_ref, acc):
    """conv3x3(int8) -> AdaIN -> ReLU -> requant(int8), one sample."""
    n_chunks = srows // chunk
    offs = [dy * wp + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    valid = _valid_mask(chunk, wp, w_img)
    n = float(w_img * w_img)
    sums = jnp.zeros((1, cin), jnp.float32)
    sumsq = jnp.zeros((1, cin), jnp.float32)
    cmin = jnp.zeros((1, cin), jnp.float32)
    cmax = jnp.zeros((1, cin), jnp.float32)
    for c in range(n_chunks):
        yc = _conv_chunk(x_ref, w_ref, cin, cin, guard + c * chunk, offs, chunk)
        acc[pl.ds(c * chunk, chunk), :] = yc
        sums, sumsq, cmin, cmax = _stats_update_slim(
            yc, valid, sums, sumsq, cmin, cmax)

    mean = sums / n
    var = jnp.maximum(sumsq / n - mean * mean, 0.0)
    g = g_ref[0, :, :].astype(jnp.float32)
    b = b_ref[0, :, :].astype(jnp.float32)
    a = g * jax.lax.rsqrt(var + eps)
    d = b - mean * a
    hi = jnp.maximum(a * cmax, a * cmin) + d
    amax = jnp.max(jnp.maximum(hi, 0.0))
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    a2 = a * s  # fold the requant scale into the affine: one fewer VPU op
    d2 = d * s

    for c in range(n_chunks):
        xf = acc[pl.ds(c * chunk, chunk), :].astype(jnp.float32)
        y = jnp.minimum(jnp.maximum(xf * a2 + d2, 0.0), 127.0)  # relu -> no lo clip
        q = jnp.round(y).astype(jnp.int8)
        o_ref[0, pl.ds(guard + c * chunk, chunk), :] = jnp.where(
            valid, q, jnp.int8(0))
    o_ref[0, pl.ds(0, guard), :] = jnp.zeros((guard, cin), jnp.int8)
    o_ref[0, pl.ds(guard + srows, guard), :] = jnp.zeros((guard, cin), jnp.int8)


def _kernel_res(eps, cin, wp, w_img, srows, chunk, guard,
                x_ref, h_ref, hs_ref, w_ref, g_ref, b_ref, o_ref, os_ref,
                acc, hnb):
    """conv3x3(int8) -> AdaIN -> +residual -> requant(int8), one sample.

    Three passes: (1) conv + MXU-offloaded sum/sumsq, (2) hn = conv*a+d+res
    computed once into an fp32 scratch while reducing |hn| for the exact
    amax, (3) scale+round+store from the scratch (no recompute)."""
    n_chunks = srows // chunk
    offs = [dy * wp + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    valid = _valid_mask(chunk, wp, w_img)
    n = float(w_img * w_img)
    sums = jnp.zeros((1, cin), jnp.float32)
    sumsq = jnp.zeros((1, cin), jnp.float32)
    for c in range(n_chunks):
        yc = _conv_chunk(x_ref, w_ref, cin, cin, guard + c * chunk, offs, chunk)
        acc[pl.ds(c * chunk, chunk), :] = yc
        xf = jnp.where(valid, yc.astype(jnp.float32), 0.0)
        sums = sums + jnp.sum(xf, axis=0, keepdims=True)
        sumsq = sumsq + jnp.sum(xf * xf, axis=0, keepdims=True)

    mean = sums / n
    var = jnp.maximum(sumsq / n - mean * mean, 0.0)
    g = g_ref[0, :, :].astype(jnp.float32)
    b = b_ref[0, :, :].astype(jnp.float32)
    a = g * jax.lax.rsqrt(var + eps)
    d = b - mean * a
    hs = hs_ref[0, 0, 0]

    amax = jnp.float32(0.0)
    for c in range(n_chunks):
        xf = acc[pl.ds(c * chunk, chunk), :].astype(jnp.float32)
        hf = h_ref[0, pl.ds(guard + c * chunk, chunk), :].astype(jnp.float32) * hs
        hn = jnp.where(valid, xf * a + d + hf, 0.0)
        hnb[pl.ds(c * chunk, chunk), :] = hn
        amax = jnp.maximum(amax, jnp.max(jnp.abs(hn)))
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    os_ref[0, 0, 0] = jnp.where(amax > 0, amax / 127.0, 1.0)

    for c in range(n_chunks):
        hn = hnb[pl.ds(c * chunk, chunk), :] * s
        q = jnp.round(jnp.clip(hn, -127.0, 127.0)).astype(jnp.int8)
        o_ref[0, pl.ds(guard + c * chunk, chunk), :] = q
    o_ref[0, pl.ds(0, guard), :] = jnp.zeros((guard, cin), jnp.int8)
    o_ref[0, pl.ds(guard + srows, guard), :] = jnp.zeros((guard, cin), jnp.int8)


def _kernel_res_hifi(eps, cin, wp, w_img, srows, chunk, guard,
                     x_ref, hb_ref, w_ref, g_ref, b_ref, o_ref, ohb_ref, acc):
    """conv3x3(int8) -> AdaIN -> +bf16 residual -> dual emit, one sample.

    Hi-fi variant of :func:`_kernel_res`: the residual stream crosses
    blocks as bf16 (``hb_ref``/``ohb_ref``) instead of int8+scale, so the
    carried signal never round-trips through int8 — only the CONV INPUT
    is quantized, exactly like the int8 XLA path. This is the fix for the
    1.6 dB all-Pallas PSNR gap, which per-stage attribution pinned on the
    trunk's quantized residual carry (VERDICT r3 directive #3;
    tools/check_psnr_tpu.py).

    Passes: (1) conv + stats, (2) hn = conv*a + d + res written ONCE as
    the bf16 carry while reducing |hn| for the exact amax, (3) the int8
    conv-input copy is requantized FROM the bf16 carry (so int8 is a
    consistent quantization of the signal the next block actually adds).
    """
    n_chunks = srows // chunk
    offs = [dy * wp + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    valid = _valid_mask(chunk, wp, w_img)
    n = float(w_img * w_img)
    sums = jnp.zeros((1, cin), jnp.float32)
    sumsq = jnp.zeros((1, cin), jnp.float32)
    for c in range(n_chunks):
        yc = _conv_chunk(x_ref, w_ref, cin, cin, guard + c * chunk, offs, chunk)
        acc[pl.ds(c * chunk, chunk), :] = yc
        xf = jnp.where(valid, yc.astype(jnp.float32), 0.0)
        sums = sums + jnp.sum(xf, axis=0, keepdims=True)
        sumsq = sumsq + jnp.sum(xf * xf, axis=0, keepdims=True)

    mean = sums / n
    var = jnp.maximum(sumsq / n - mean * mean, 0.0)
    g = g_ref[0, :, :].astype(jnp.float32)
    b = b_ref[0, :, :].astype(jnp.float32)
    a = g * jax.lax.rsqrt(var + eps)
    d = b - mean * a

    amax = jnp.float32(0.0)
    for c in range(n_chunks):
        xf = acc[pl.ds(c * chunk, chunk), :].astype(jnp.float32)
        hf = hb_ref[0, pl.ds(guard + c * chunk, chunk), :].astype(jnp.float32)
        hn = jnp.where(valid, xf * a + d + hf, 0.0)
        ohb_ref[0, pl.ds(guard + c * chunk, chunk), :] = hn.astype(jnp.bfloat16)
        amax = jnp.maximum(amax, jnp.max(jnp.abs(hn)))
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)

    for c in range(n_chunks):
        hn = ohb_ref[0, pl.ds(guard + c * chunk, chunk), :].astype(jnp.float32) * s
        q = jnp.round(jnp.clip(hn, -127.0, 127.0)).astype(jnp.int8)
        o_ref[0, pl.ds(guard + c * chunk, chunk), :] = q
    o_ref[0, pl.ds(0, guard), :] = jnp.zeros((guard, cin), jnp.int8)
    o_ref[0, pl.ds(guard + srows, guard), :] = jnp.zeros((guard, cin), jnp.int8)
    ohb_ref[0, pl.ds(0, guard), :] = jnp.zeros((guard, cin), jnp.bfloat16)
    ohb_ref[0, pl.ds(guard + srows, guard), :] = jnp.zeros((guard, cin),
                                                           jnp.bfloat16)


def _kernel_res_hifi2(eps, cin, wp, w_img, srows, chunk, guard,
                      x_ref, h1_ref, h2_ref, hs_ref, w_ref, g_ref, b_ref,
                      o1_ref, o2_ref, os_ref, acc, hnb):
    """conv3x3(int8) -> AdaIN -> +2xint8 residual -> dual-plane requant.

    Error-plane variant of :func:`_kernel_res_hifi` (VERDICT r4 #2): the
    residual stream crosses blocks as TWO int8 planes under one per-sample
    scale — value = (q1 + q2/254) * hs — i.e. ~15 significant bits vs the
    bf16 carry's 8, while writing 2 B/elem (q1 feeds the next conv1 AND
    anchors the residual; the bf16 carry writes 3 B/elem: int8 conv copy +
    bf16 residual). q2 = round((hn*s - q1) * 254) with q1 = round(hn*s),
    so the encoded error is in [-127, 127] wherever q1 is unclipped.

    Passes mirror :func:`_kernel_res`: (1) conv + stats, (2) hn = conv*a +
    d + (h1 + h2/254)*hs into an fp32 scratch while reducing |hn| for the
    exact amax, (3) dual-plane quantize + store from the scratch.
    """
    n_chunks = srows // chunk
    offs = [dy * wp + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    valid = _valid_mask(chunk, wp, w_img)
    n = float(w_img * w_img)
    sums = jnp.zeros((1, cin), jnp.float32)
    sumsq = jnp.zeros((1, cin), jnp.float32)
    for c in range(n_chunks):
        yc = _conv_chunk(x_ref, w_ref, cin, cin, guard + c * chunk, offs, chunk)
        acc[pl.ds(c * chunk, chunk), :] = yc
        xf = jnp.where(valid, yc.astype(jnp.float32), 0.0)
        sums = sums + jnp.sum(xf, axis=0, keepdims=True)
        sumsq = sumsq + jnp.sum(xf * xf, axis=0, keepdims=True)

    mean = sums / n
    var = jnp.maximum(sumsq / n - mean * mean, 0.0)
    g = g_ref[0, :, :].astype(jnp.float32)
    b = b_ref[0, :, :].astype(jnp.float32)
    a = g * jax.lax.rsqrt(var + eps)
    d = b - mean * a
    hs = hs_ref[0, 0, 0]
    hs2 = hs * jnp.float32(1.0 / 254.0)

    amax = jnp.float32(0.0)
    for c in range(n_chunks):
        xf = acc[pl.ds(c * chunk, chunk), :].astype(jnp.float32)
        h1 = h1_ref[0, pl.ds(guard + c * chunk, chunk), :].astype(jnp.float32)
        h2 = h2_ref[0, pl.ds(guard + c * chunk, chunk), :].astype(jnp.float32)
        hn = jnp.where(valid, xf * a + d + h1 * hs + h2 * hs2, 0.0)
        hnb[pl.ds(c * chunk, chunk), :] = hn
        amax = jnp.maximum(amax, jnp.max(jnp.abs(hn)))
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    os_ref[0, 0, 0] = jnp.where(amax > 0, amax / 127.0, 1.0)

    for c in range(n_chunks):
        t = hnb[pl.ds(c * chunk, chunk), :] * s
        q1f = jnp.round(jnp.clip(t, -127.0, 127.0))
        q2 = jnp.round(jnp.clip((t - q1f) * 254.0, -127.0, 127.0))
        o1_ref[0, pl.ds(guard + c * chunk, chunk), :] = q1f.astype(jnp.int8)
        o2_ref[0, pl.ds(guard + c * chunk, chunk), :] = q2.astype(jnp.int8)
    for o in (o1_ref, o2_ref):
        o[0, pl.ds(0, guard), :] = jnp.zeros((guard, cin), jnp.int8)
        o[0, pl.ds(guard + srows, guard), :] = jnp.zeros((guard, cin), jnp.int8)


def _kernel_up(eps, cin, cout4, wp, w_img, srows, chunk, guard,
               x_ref, w_ref, o_ref, os_ref, acc):
    """ConvT4x4s2 (9-tap phase matmul) -> IN -> ReLU -> requant, s2d out."""
    n_chunks = srows // chunk
    offs = [dy * wp + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    valid = _valid_mask(chunk, wp, w_img)
    cout = cout4 // 4
    n = float(w_img * w_img * 4)
    sums = jnp.zeros((1, cout4), jnp.float32)
    sumsq = jnp.zeros((1, cout4), jnp.float32)
    cmin = jnp.zeros((1, cout4), jnp.float32)
    cmax = jnp.zeros((1, cout4), jnp.float32)
    for c in range(n_chunks):
        yc = _conv_chunk(x_ref, w_ref, cin, cout4, guard + c * chunk, offs, chunk)
        acc[pl.ds(c * chunk, chunk), :] = yc
        sums, sumsq, cmin, cmax = _stats_update_slim(
            yc, valid, sums, sumsq, cmin, cmax)

    def _fold(v):
        return (v[:, 0 * cout:1 * cout] + v[:, 1 * cout:2 * cout]
                + v[:, 2 * cout:3 * cout] + v[:, 3 * cout:4 * cout])

    mean_c = _fold(sums) / n
    sq_c = _fold(sumsq) / n
    var_c = jnp.maximum(sq_c - mean_c * mean_c, 0.0)
    a_c = jax.lax.rsqrt(var_c + eps)
    d_c = -mean_c * a_c
    a = jnp.concatenate([a_c, a_c, a_c, a_c], axis=1)
    d = jnp.concatenate([d_c, d_c, d_c, d_c], axis=1)
    hi = jnp.maximum(a * cmax, a * cmin) + d
    amax = jnp.max(jnp.maximum(hi, 0.0))
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    os_ref[0, 0, 0] = jnp.where(amax > 0, amax / 127.0, 1.0)
    a2 = a * s
    d2 = d * s

    for c in range(n_chunks):
        xf = acc[pl.ds(c * chunk, chunk), :].astype(jnp.float32)
        y = jnp.minimum(jnp.maximum(xf * a2 + d2, 0.0), 127.0)
        q = jnp.round(y).astype(jnp.int8)
        o_ref[0, pl.ds(c * chunk, chunk), :] = jnp.where(valid, q, jnp.int8(0))


def conv3x3_adain_relu_requant(x_q, w_packed, gamma, beta,
                               w_img: int = 64, eps: float = _EPS,
                               chunk_rows: int = 16):
    """Fused resblock conv1 site (padded-col layout).

    Args:
      x_q: [B, GUARD + w_img*(w_img+8) + GUARD, C] int8 from
        :func:`to_padded_rows` (or a previous v2 kernel).
      w_packed: [9C, C] int8 (same packing as v1).
      gamma, beta: [B, C] float32.
    """
    wp, srows, chunk, _ = geometry(w_img, chunk_rows)
    g = guard_rows(w_img)
    bsz, xrows, cin = x_q.shape
    assert xrows == srows + 2 * g and w_packed.shape == (9 * cin, cin)
    kernel = functools.partial(_kernel_relu, eps, cin, wp, w_img, srows, chunk, g)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, xrows, cin), jnp.int8),
        scratch_shapes=[pltpu.VMEM((srows, cin), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(x_q, w_packed, gamma[:, None, :], beta[:, None, :])


def conv3x3_adain_residual_requant(y1_q, h_q, h_scale, w_packed, gamma, beta,
                                   w_img: int = 64, eps: float = _EPS,
                                   chunk_rows: int = 16):
    """Fused resblock conv2 site with quantized residual carry (v2 layout)."""
    wp, srows, chunk, _ = geometry(w_img, chunk_rows)
    g = guard_rows(w_img)
    bsz, xrows, cin = y1_q.shape
    assert xrows == srows + 2 * g and w_packed.shape == (9 * cin, cin)
    kernel = functools.partial(_kernel_res, eps, cin, wp, w_img, srows, chunk, g)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((9 * cin, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, xrows, cin), jnp.int8),
            jax.ShapeDtypeStruct((bsz, 1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((srows, cin), jnp.int32),
                        pltpu.VMEM((srows, cin), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(y1_q, h_q, h_scale.reshape(bsz, 1, 1), w_packed,
      gamma[:, None, :], beta[:, None, :])


def conv3x3_adain_residual_hifi(y1_q, h_bf16, w_packed, gamma, beta,
                                w_img: int = 64, eps: float = _EPS,
                                chunk_rows: int = 16):
    """Fused resblock conv2 site with a bf16 residual carry.

    Returns ``(h_int8, h_bf16_new)``: the int8 slab feeds the next conv1
    (or the decoder), the bf16 slab is the exact residual stream for the
    next conv2. See :func:`_kernel_res_hifi` for why.
    """
    wp, srows, chunk, _ = geometry(w_img, chunk_rows)
    g = guard_rows(w_img)
    bsz, xrows, cin = y1_q.shape
    assert xrows == srows + 2 * g and w_packed.shape == (9 * cin, cin)
    assert h_bf16.shape == (bsz, xrows, cin) and h_bf16.dtype == jnp.bfloat16
    kernel = functools.partial(_kernel_res_hifi, eps, cin, wp, w_img, srows,
                               chunk, g)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, xrows, cin), jnp.int8),
            jax.ShapeDtypeStruct((bsz, xrows, cin), jnp.bfloat16),
        ],
        scratch_shapes=[pltpu.VMEM((srows, cin), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(y1_q, h_bf16, w_packed, gamma[:, None, :], beta[:, None, :])


def conv3x3_adain_residual_hifi2(y1_q, h1_q, h2_q, h_scale, w_packed, gamma,
                                 beta, w_img: int = 64, eps: float = _EPS,
                                 chunk_rows: int = 16):
    """Fused resblock conv2 site with a 2x-int8 error-plane residual carry.

    Returns ``(h1_int8, h2_int8, scale)``: h1 feeds the next conv1 (or the
    decoder) exactly like the stock path's slab; (h1 + h2/254) * scale is
    the high-precision residual for the next conv2. See
    :func:`_kernel_res_hifi2`.
    """
    wp, srows, chunk, _ = geometry(w_img, chunk_rows)
    g = guard_rows(w_img)
    bsz, xrows, cin = y1_q.shape
    assert xrows == srows + 2 * g and w_packed.shape == (9 * cin, cin)
    assert h1_q.shape == h2_q.shape == (bsz, xrows, cin)
    kernel = functools.partial(_kernel_res_hifi2, eps, cin, wp, w_img, srows,
                               chunk, g)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((9 * cin, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, xrows, cin), jnp.int8),
            jax.ShapeDtypeStruct((bsz, xrows, cin), jnp.int8),
            jax.ShapeDtypeStruct((bsz, 1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((srows, cin), jnp.int32),
                        pltpu.VMEM((srows, cin), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(y1_q, h1_q, h2_q, h_scale.reshape(bsz, 1, 1), w_packed,
      gamma[:, None, :], beta[:, None, :])


def convt4x4s2_in_relu_requant(x_q, w_packed, w_img: int, eps: float = _EPS,
                               chunk_rows: int = 16):
    """Fused decoder upsampling site (v2 layout). Output s2d, guard cols
    zeroed; un-phase with :func:`unphase_s2d`."""
    wp, srows, chunk, _ = geometry(w_img, chunk_rows)
    g = guard_rows(w_img)
    bsz, xrows, cin = x_q.shape
    assert xrows == srows + 2 * g, (xrows, srows)
    cout4 = w_packed.shape[1]
    assert w_packed.shape[0] == 9 * cin
    kernel = functools.partial(
        _kernel_up, eps, cin, cout4, wp, w_img, srows, chunk, g)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, srows, cout4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, srows, cout4), jnp.int8),
            jax.ShapeDtypeStruct((bsz, 1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((srows, cout4), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x_q, w_packed)


def unphase_s2d(y_s2d: jax.Array, w_img: int, cout: int) -> jax.Array:
    """[B, w_img*(w_img+8), 4*cout] s2d -> [B, 2*w_img, 2*w_img, cout]."""
    b = y_s2d.shape[0]
    wp = w_img + 8
    y = y_s2d.reshape(b, w_img, wp, 2, 2, cout)[:, :, :w_img]
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * w_img, 2 * w_img, cout)


# -------------------------------------------------------- phase-split ConvT


def pack_convt_weights_ps(w_hwio, cin: int, cout: int):
    """ConvT4x4s2 kernel -> [16*cin, cout] int8, phase-major tap blocks.

    Unlike :func:`msig_tpu.ops.fused_conv_int8.pack_convt_weights` (9-tap
    K-concat with 5/9 zero blocks), each output phase q=(qy,qx) keeps ONLY
    its 2x2 valid taps: out(2I+qy, 2J+qx) = sum_{dy,dx in taps(q)}
    x(I+dy, J+dx) * w[2dy+2-qy, 2dx+2-qx]. Block order: [q][tap][cin].
    Returns (packed weights, per-phase tap offset lists in (dy, dx)).
    """
    import numpy as np

    assert w_hwio.shape == (4, 4, cin, cout)
    w = np.asarray(w_hwio)
    packed = np.zeros((16 * cin, cout), np.int8)
    taps_by_phase = []
    blk = 0
    for qy in (0, 1):
        for qx in (0, 1):
            dys = (-1, 0) if qy == 0 else (0, 1)
            dxs = (-1, 0) if qx == 0 else (0, 1)
            taps = []
            for dy in dys:
                for dx in dxs:
                    packed[blk * cin:(blk + 1) * cin] = w[2 * dy + 2 - qy,
                                                          2 * dx + 2 - qx]
                    taps.append((dy, dx))
                    blk += 1
            taps_by_phase.append(taps)
    return jnp.asarray(packed), taps_by_phase


def _kernel_up_ps(eps, cin, cout, wp, w_img, srows, chunk, guard, out_guard,
                  taps_by_phase, x_ref, w_ref, o_ref, os_ref, acc):
    """Phase-split ConvT4x4s2 -> IN -> ReLU -> requant (s2d out).

    16 dense [chunk, cin] x [cin, cout] matmuls per chunk (4 phases x 4
    taps) — no zero-block K work. Identical numerics to _kernel_up."""
    n_chunks = srows // chunk
    valid = _valid_mask(chunk, wp, w_img)
    cout4 = 4 * cout
    n = float(w_img * w_img * 4)
    sums = jnp.zeros((1, cout4), jnp.float32)
    sumsq = jnp.zeros((1, cout4), jnp.float32)
    cmin = jnp.zeros((1, cout4), jnp.float32)
    cmax = jnp.zeros((1, cout4), jnp.float32)
    for c in range(n_chunks):
        phases = []
        blk = 0
        for q in range(4):
            aq = None
            for (dy, dx) in taps_by_phase[q]:
                lhs = x_ref[0, pl.ds(guard + c * chunk + dy * wp + dx, chunk), :]
                d = jax.lax.dot_general(
                    lhs, w_ref[blk * cin:(blk + 1) * cin, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                aq = d if aq is None else aq + d
                blk += 1
            phases.append(aq)
        yc = jnp.concatenate(phases, axis=1)
        acc[pl.ds(c * chunk, chunk), :] = yc
        sums, sumsq, cmin, cmax = _stats_update_slim(
            yc, valid, sums, sumsq, cmin, cmax)

    def _fold(v):
        return (v[:, 0 * cout:1 * cout] + v[:, 1 * cout:2 * cout]
                + v[:, 2 * cout:3 * cout] + v[:, 3 * cout:4 * cout])

    mean_c = _fold(sums) / n
    sq_c = _fold(sumsq) / n
    var_c = jnp.maximum(sq_c - mean_c * mean_c, 0.0)
    a_c = jax.lax.rsqrt(var_c + eps)
    d_c = -mean_c * a_c
    a = jnp.concatenate([a_c, a_c, a_c, a_c], axis=1)
    d = jnp.concatenate([d_c, d_c, d_c, d_c], axis=1)
    hi = jnp.maximum(a * cmax, a * cmin) + d
    amax = jnp.max(jnp.maximum(hi, 0.0))
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    os_ref[0, 0, 0] = jnp.where(amax > 0, amax / 127.0, 1.0)
    a2 = a * s
    d2 = d * s

    for c in range(n_chunks):
        xf = acc[pl.ds(c * chunk, chunk), :].astype(jnp.float32)
        y = jnp.minimum(jnp.maximum(xf * a2 + d2, 0.0), 127.0)
        q = jnp.round(y).astype(jnp.int8)
        o_ref[0, pl.ds(out_guard + c * chunk, chunk), :] = jnp.where(
            valid, q, jnp.int8(0))
    if out_guard:
        o_ref[0, pl.ds(0, out_guard), :] = jnp.zeros((out_guard, cout4), jnp.int8)
        o_ref[0, pl.ds(out_guard + srows, out_guard), :] = jnp.zeros(
            (out_guard, cout4), jnp.int8)


def convt4x4s2_in_relu_requant_ps(x_q, w_packed_ps, taps_by_phase, w_img: int,
                                  eps: float = _EPS, chunk_rows: int = 16,
                                  guarded_out: bool = False):
    """Phase-split fused upsampling site. Same contract as
    :func:`convt4x4s2_in_relu_requant` but with
    (w_packed_ps, taps_by_phase) from :func:`pack_convt_weights_ps`.
    ``guarded_out`` emits zero guard rows around the s2d output so a
    following slab kernel (ops/fused_dec_int8.up1_s2d16) can read shifted
    row slices directly."""
    wp, srows, chunk, _ = geometry(w_img, chunk_rows)
    g = guard_rows(w_img)
    bsz, xrows, cin = x_q.shape
    assert xrows == srows + 2 * g, (xrows, srows)
    cout = w_packed_ps.shape[1]
    assert w_packed_ps.shape[0] == 16 * cin
    og = g if guarded_out else 0
    out_rows = srows + 2 * og
    kernel = functools.partial(
        _kernel_up_ps, eps, cin, cout, wp, w_img, srows, chunk, g, og,
        tuple(tuple(t) for t in taps_by_phase))
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * cin, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, out_rows, 4 * cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, out_rows, 4 * cout), jnp.int8),
            jax.ShapeDtypeStruct((bsz, 1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((srows, 4 * cout), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x_q, w_packed_ps)


# Static per-phase tap lists of pack_convt_weights_ps (deterministic).
PS_TAPS = tuple(
    tuple((dy, dx)
          for dy in ((-1, 0) if qy == 0 else (0, 1))
          for dx in ((-1, 0) if qx == 0 else (0, 1)))
    for qy in (0, 1) for qx in (0, 1)
)
