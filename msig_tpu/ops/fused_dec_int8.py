"""All-Pallas int8 decoder tail: up1-on-s2d + fused final conv7 + tanh->uint8.

Round-3 stage budget (docs/PERF.md) showed the decoder's cost was mostly
XLA layout glue: un-phasing up0's space-to-depth output back to the
128-grid (9.2 ms at B=128) and the final reflect-pad + int8 conv7 + dequant
+ tanh stage (15.4 ms). This module removes both:

  * ``up1_s2d16``: the second ConvT4x4s2 site consumes up0's s2d-4 output
    DIRECTLY on the 64-grid (input blocks r=(ry,rx) of 128 lanes each are
    the 128-map's 2x2 cell phases) and emits the 256-map as s2d-16 —
    [B, 64*72 rows, 16*64 lanes], block s=(sy,sx) holding output pixel
    (4I+sy, 4J+sx). No intermediate un-phase, no re-pad, int8-only HBM.
    Derivation: out256(2i+qy, 2j+qx) = sum_{dy in D(qy), dx in D(qx)}
    x128(i+dy, j+dx) * w[2dy+2-qy, 2dx+2-qx] with D(0)={-1,0}, D(1)={0,1}
    (the validated phase-split ConvT of ops/fused_conv_int8_v2.py); writing
    i = 2I+ry maps tap rows to (dI, ry') = divmod(ry+dy, 2) on the 64-grid
    and output phase sy = 2*ry + qy.

  * ``reflect_fill_s2d16``: the final conv7 needs reflect padding
    (reference: /root/reference/model.py:141 nn.ReflectionPad2d(3)), but
    the guard rows/cols of the slab layout are zeros. Reflected 256-map
    values are exactly interior s2d cells with a phase permutation
    (x(-k) = x(k) => guard block sy maps to interior block 4-sy etc.), so
    a handful of cheap XLA channel-gathers fill the guards in place.

  * ``final7_tanh_u8``: 7x7 conv (64->3) as 9 dense [chunk,1024]x[1024,48]
    tap matmuls on the s2d-16 slab (output lanes = 16 phases x RGB), with
    the dequant (weight-scale x activation inv-scale), bias, tanh and the
    uint8 serving conversion fused into the epilogue. Replaces the XLA
    reflect-pad + conv + slice + tanh + quantize chain.

Reference scope: StyleCycleGANGenerator decoder tail
(/root/reference/model.py:136-143) — ConvT(128->64)+IN+ReLU, reflect
conv7(64->3), Tanh — int8-quantized per msig_tpu/infer/quantized.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msig_tpu.ops.fused_conv_int8_v2 import (
    _interpret,
    _stats_update_slim,
    _valid_mask,
    guard_rows,
)

_EPS = 1e-5

# --- HBM-staged accumulator precision (VERDICT r4 #3) ---------------------
# The 128-grid enc0/up1 sites stage a 71 MB int32 accumulator slab through
# HBM. MSIG_STAGE_FP16=1 stages it as fp16 x 2^-12 instead: HALF the
# round-trip traffic. IN statistics stay exact (computed from the int32
# chunks before the drain); only the requant input carries the fp16
# staging noise — ~2^-11 relative, <= 1/16 of an int8 code step
# (PSNR-gated by tools/check_psnr_tpu.py and the 512^2 slab tests).
# Max |acc| is < 127*127*9*512 ~= 7.5e7; x 2^-12 keeps it < 2e4, inside
# fp16 range with full mantissa precision.
STAGE_SCALE = float(2.0 ** -12)


def stage_dtype():
    import os

    return (jnp.float16 if os.environ.get("MSIG_STAGE_FP16", "0") == "1"
            else jnp.int32)
WP = 72
SROWS = 64 * WP          # 4608
CHUNK = 16 * WP          # 1152
N_CHUNKS = SROWS // CHUNK


def _divmod2(t: int):
    return t // 2, t % 2  # Python floor-div handles t = -1 correctly


def dec_geometry(w_cells: int):
    """(wp, srows, chunk, n_chunks, guard) for a w_cells x w_cells s2d grid.

    w_cells=64 is the 256-pixel map (4x4 phases per cell), w_cells=128 the
    512-pixel map. Chunks shrink at 128 so the [chunk, 1024] int32 operand
    stays VMEM-friendly in the HBM-staged kernels.
    """
    wp = w_cells + 8
    srows = w_cells * wp
    chunk_cells = 16 if w_cells <= 64 else 8
    chunk = chunk_cells * wp
    assert srows % chunk == 0
    return wp, srows, chunk, srows // chunk, guard_rows(w_cells)


def _up1_conv_chunk(x_ref, w_ref, start, chunk, wp):
    """One chunk of the 16-phase ConvT: 64 [chunk,128]x[128,64] tap matmuls.

    ``start`` must be a STATIC row offset (Mosaic wants aligned dynamic row
    indices; the +-1 column taps make these inherently unaligned).
    """
    phases = []
    blk = 0
    for sy in range(4):
        ry, qy = sy // 2, sy % 2
        dys = (-1, 0) if qy == 0 else (0, 1)
        for sx in range(4):
            rx, qx = sx // 2, sx % 2
            dxs = (-1, 0) if qx == 0 else (0, 1)
            aq = None
            for dy in dys:
                dI, ry2 = _divmod2(ry + dy)
                for dx in dxs:
                    dJ, rx2 = _divmod2(rx + dx)
                    r2 = 2 * ry2 + rx2
                    lhs = x_ref[0, pl.ds(start + dI * wp + dJ, chunk),
                                r2 * 128:(r2 + 1) * 128]
                    d = jax.lax.dot_general(
                        lhs, w_ref[blk * 128:(blk + 1) * 128, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    aq = d if aq is None else aq + d
                    blk += 1
            phases.append(aq)
    return jnp.concatenate(phases, axis=1)


def _reflect_fill(o_ref, guard, wp, w_cells, srows):
    """In-VMEM ReflectionPad2d(3) guard fill on an s2d-16 slab (see the
    lane-perm block comment below). Row guards first, then one halo write
    per cell row (only rows with live halo data), then the corner row read
    by output cell (0,0)'s (dI=-1, dJ=-1) tap."""
    o_ref[0, pl.ds(guard - wp, wp), :] = _py_top(o_ref[0, pl.ds(guard, wp), :])
    o_ref[0, pl.ds(guard + srows, wp), :] = _py_bot(
        o_ref[0, pl.ds(guard + srows - wp, wp), :])

    # Mosaic requires 8-aligned dynamic row indices; wp and guard are
    # multiples of 8, so each cell row's halo block [base+w_cells, base+wp)
    # is aligned and its two live rows (w_cells: <- col w_cells-1, the
    # block-above's last sublane; wp-1: <- next cell row's col 0, the
    # block-below's first sublane) are reached with aligned 8-row loads +
    # a one-sublane roll.
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    for ci in range(w_cells + 2):  # unrolled: static aligned indices
        base = guard - wp + ci * wp
        a = o_ref[0, pl.ds(base + w_cells - 8, 8), :]
        c = o_ref[0, pl.ds(base + wp, 8), :]
        a_roll = jnp.concatenate([a[7:8], a[:7]], axis=0)
        c_roll = jnp.concatenate([c[1:], c[:1]], axis=0)
        o_ref[0, pl.ds(base + w_cells, 8), :] = jnp.where(
            sub == 0, _px_r(a_roll),
            jnp.where(sub == 7, _px_l(c_roll), jnp.int8(0)))
    d = o_ref[0, pl.ds(guard - wp, 8), :]
    d_roll = jnp.concatenate([d[1:], d[:1]], axis=0)
    o_ref[0, pl.ds(guard - wp - 8, 8), :] = jnp.where(
        sub == 7, _px_l(d_roll), jnp.int8(0))


# --------------------------------------------------------------- up1 on s2d


def pack_up1_s2d16(w_hwio) -> jax.Array:
    """[4,4,128,64] int8 ConvT kernel -> [16*4*128, 64], s-major tap blocks.

    For output phase s = sy*4+sx the 4 taps (dy, dx) are laid out in
    D(qy) x D(qx) order; each block is w[2dy+2-qy, 2dx+2-qx] (128x64).
    """
    w = np.asarray(w_hwio)
    assert w.shape == (4, 4, 128, 64)
    packed = np.zeros((16 * 4 * 128, 64), np.int8)
    blk = 0
    for sy in range(4):
        ry, qy = sy // 2, sy % 2
        dys = (-1, 0) if qy == 0 else (0, 1)
        for sx in range(4):
            rx, qx = sx // 2, sx % 2
            dxs = (-1, 0) if qx == 0 else (0, 1)
            for dy in dys:
                for dx in dxs:
                    packed[blk * 128:(blk + 1) * 128] = w[2 * dy + 2 - qy,
                                                          2 * dx + 2 - qx]
                    blk += 1
    return jnp.asarray(packed)


def _kernel_up1_s2d16(eps, guard, x_ref, w_ref, o_ref, os_ref, acc):
    """ConvT4x4s2 on the s2d-4 slab -> s2d-16 slab + IN(fold16) + ReLU + rq."""
    valid = _valid_mask(CHUNK, WP, 64)
    n = float(256 * 256)
    sums = jnp.zeros((1, 1024), jnp.float32)
    sumsq = jnp.zeros((1, 1024), jnp.float32)
    cmin = jnp.zeros((1, 1024), jnp.float32)
    cmax = jnp.zeros((1, 1024), jnp.float32)
    for c in range(N_CHUNKS):
        yc = _up1_conv_chunk(x_ref, w_ref, guard + c * CHUNK, CHUNK, WP)
        acc[pl.ds(c * CHUNK, CHUNK), :] = yc
        sums, sumsq, cmin, cmax = _stats_update_slim(
            yc, valid, sums, sumsq, cmin, cmax)

    def _fold(v):
        out = v[:, 0:64]
        for k in range(1, 16):
            out = out + v[:, k * 64:(k + 1) * 64]
        return out

    mean_c = _fold(sums) / n
    sq_c = _fold(sumsq) / n
    var_c = jnp.maximum(sq_c - mean_c * mean_c, 0.0)
    a_c = jax.lax.rsqrt(var_c + eps)
    d_c = -mean_c * a_c
    a = jnp.concatenate([a_c] * 16, axis=1)
    d = jnp.concatenate([d_c] * 16, axis=1)
    hi = jnp.maximum(a * cmax, a * cmin) + d
    amax = jnp.max(jnp.maximum(hi, 0.0))
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    os_ref[0, 0, 0] = jnp.where(amax > 0, amax / 127.0, 1.0)
    a2 = a * s
    d2 = d * s

    for c in range(N_CHUNKS):
        xf = acc[pl.ds(c * CHUNK, CHUNK), :].astype(jnp.float32)
        y = jnp.minimum(jnp.maximum(xf * a2 + d2, 0.0), 127.0)
        q = jnp.round(y).astype(jnp.int8)
        o_ref[0, pl.ds(guard + c * CHUNK, CHUNK), :] = jnp.where(
            valid, q, jnp.int8(0))
    o_ref[0, pl.ds(0, guard), :] = jnp.zeros((guard, 1024), jnp.int8)
    o_ref[0, pl.ds(guard + SROWS, guard), :] = jnp.zeros((guard, 1024), jnp.int8)
    # A full-slab masked halo pass measured +9 ms at B=256; the per-cell-row
    # fill in _reflect_fill touches only the live halo rows.
    _reflect_fill(o_ref, guard, WP, 64, SROWS)


def up1_s2d16(x_q: jax.Array, w_packed: jax.Array, eps: float = _EPS):
    """up0's guarded s2d-4 slab [B, g+4608+g, 512] -> (REFLECT-guarded
    s2d-16 slab [B, g+4608+g, 1024] int8, inv_scale [B,1,1]).

    The kernel fills the slab's guard rows/cols with lane-permuted copies
    of the interior (ReflectionPad2d(3) semantics, in VMEM where it is
    ~free), so the downstream final7 kernel's plain 9-tap conv IS the
    reflect-pad conv — no border repair pass.
    """
    g = guard_rows(64)
    bsz, xrows, cin = x_q.shape
    assert xrows == SROWS + 2 * g and cin == 512, (x_q.shape,)
    assert w_packed.shape == (16 * 4 * 128, 64)
    return pl.pallas_call(
        functools.partial(_kernel_up1_s2d16, eps, g),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, xrows, 512), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_packed.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, xrows, 1024), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, xrows, 1024), jnp.int8),
            jax.ShapeDtypeStruct((bsz, 1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((SROWS, 1024), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x_q, w_packed)


# ----------------------------------------- up1 at 512^2: HBM-staged variant
#
# At the 128-cell grid (512^2 output) the single-kernel design's int32
# accumulator slab is 17408 x 1024 x 4 B = 71 MB — with the 9 MB input and
# 18 MB output slabs it cannot stay VMEM-resident. The site splits into two
# kernels staging the int32 accumulator through HBM (142 MB/sample of
# extra HBM traffic ~= 0.2 ms at v5e bandwidth, negligible vs the conv):
#
#   A: conv chunks + IN stats. Double-buffered async copies drain each
#      [chunk, 1024] int32 block to HBM while the next chunk's matmuls run.
#   XLA: fold the [B, 4, 1024] stats to the requant affine (a2, d2) and the
#      absorbed inv-scale — same math as the in-kernel epilogue.
#   B: stream the int32 blocks back (prefetch depth 2), requant to int8,
#      zero the guards and run the reflect fill on the resident output slab.


def _kernel_up1_conv_hbm(guard, wp, w_cells, chunk, n_chunks,
                         x_ref, w_ref, acc_hbm, st_ref, buf, sems):
    i = pl.program_id(0)
    valid = _valid_mask(chunk, wp, w_cells)
    sums = jnp.zeros((1, 1024), jnp.float32)
    sumsq = jnp.zeros((1, 1024), jnp.float32)
    cmin = jnp.zeros((1, 1024), jnp.float32)
    cmax = jnp.zeros((1, 1024), jnp.float32)
    fp16 = buf.dtype == jnp.float16
    pending = [None, None]
    for c in range(n_chunks):
        slot = c % 2
        if pending[slot] is not None:
            pending[slot].wait()
        yc = _up1_conv_chunk(x_ref, w_ref, guard + c * chunk, chunk, wp)
        if fp16:
            # fp16 x 2^-12 staging (see STAGE_SCALE): stats stay exact.
            buf[slot] = (yc.astype(jnp.float32)
                         * jnp.float32(STAGE_SCALE)).astype(jnp.float16)
        else:
            buf[slot] = yc
        dma = pltpu.make_async_copy(
            buf.at[slot],
            acc_hbm.at[i, pl.ds(c * chunk, chunk), :],
            sems.at[slot])
        dma.start()
        pending[slot] = dma
        sums, sumsq, cmin, cmax = _stats_update_slim(
            yc, valid, sums, sumsq, cmin, cmax)
    for dma in pending:
        dma.wait()
    st_ref[0, 0:1, :] = sums
    st_ref[0, 1:2, :] = sumsq
    st_ref[0, 2:3, :] = cmin
    st_ref[0, 3:4, :] = cmax


def _up1_scales(stats: jax.Array, n: float, eps: float):
    """[B, 4, 1024] (sums, sumsq, cmin, cmax) -> ([B, 2, 1024] (a2, d2),
    inv_scale [B, 1, 1]) — the XLA replica of the in-kernel IN fold16 +
    exact-amax requant epilogue."""
    sums, sumsq, cmin, cmax = (stats[:, k] for k in range(4))
    b = stats.shape[0]

    def _fold(v):
        return v.reshape(b, 16, 64).sum(axis=1)

    mean_c = _fold(sums) / n
    sq_c = _fold(sumsq) / n
    var_c = jnp.maximum(sq_c - mean_c * mean_c, 0.0)
    a_c = jax.lax.rsqrt(var_c + eps)
    d_c = -mean_c * a_c
    a = jnp.tile(a_c, (1, 16))
    d = jnp.tile(d_c, (1, 16))
    hi = jnp.maximum(a * cmax, a * cmin) + d
    amax = jnp.max(jnp.maximum(hi, 0.0), axis=1)
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    inv_s = jnp.where(amax > 0, amax / 127.0, 1.0)
    ad = jnp.stack([a * s[:, None], d * s[:, None]], axis=1)
    return ad, inv_s.reshape(b, 1, 1)


def _kernel_up1_rq_hbm(guard, wp, w_cells, chunk, n_chunks, srows,
                       acc_hbm, ad_ref, o_ref, buf, sems):
    i = pl.program_id(0)
    valid = _valid_mask(chunk, wp, w_cells)
    a2 = ad_ref[0, 0:1, :]
    d2 = ad_ref[0, 1:2, :]

    def _start(c):
        dma = pltpu.make_async_copy(
            acc_hbm.at[i, pl.ds(c * chunk, chunk), :],
            buf.at[c % 2], sems.at[c % 2])
        dma.start()
        return dma

    pending = {0: _start(0)}
    for c in range(n_chunks):
        if c + 1 < n_chunks:
            pending[c + 1] = _start(c + 1)
        pending.pop(c).wait()
        xf = buf[c % 2].astype(jnp.float32)
        y = jnp.minimum(jnp.maximum(xf * a2 + d2, 0.0), 127.0)
        q = jnp.round(y).astype(jnp.int8)
        o_ref[0, pl.ds(guard + c * chunk, chunk), :] = jnp.where(
            valid, q, jnp.int8(0))
    o_ref[0, pl.ds(0, guard), :] = jnp.zeros((guard, 1024), jnp.int8)
    o_ref[0, pl.ds(guard + srows, guard), :] = jnp.zeros(
        (guard, 1024), jnp.int8)
    _reflect_fill(o_ref, guard, wp, w_cells, srows)


def up1_s2d16_hbm(x_q: jax.Array, w_packed: jax.Array, w_cells: int = 128,
                  eps: float = _EPS):
    """HBM-staged up1 site for grids whose int32 slab exceeds VMEM.

    Same contract as :func:`up1_s2d16` (guarded s2d-4 slab in, REFLECT-
    guarded s2d-16 int8 slab + inv_scale out) on the w_cells grid.
    """
    wp, srows, chunk, n_chunks, g = dec_geometry(w_cells)
    bsz, xrows, cin = x_q.shape
    assert xrows == srows + 2 * g and cin == 512, (x_q.shape, w_cells)
    assert w_packed.shape == (16 * 4 * 128, 64)

    stage_dt = stage_dtype()
    acc, stats = pl.pallas_call(
        functools.partial(_kernel_up1_conv_hbm, g, wp, w_cells, chunk,
                          n_chunks),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, xrows, 512), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_packed.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 4, 1024), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, srows, 1024), stage_dt),
            jax.ShapeDtypeStruct((bsz, 4, 1024), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 1024), stage_dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x_q, w_packed)

    ad, inv_s = _up1_scales(stats, float((4 * w_cells) ** 2), eps)
    if stage_dt == jnp.float16:
        # Fold the staging pre-scale's inverse into a2 (zero kernel ops).
        ad = ad.at[:, 0, :].multiply(1.0 / STAGE_SCALE)

    slab = pl.pallas_call(
        functools.partial(_kernel_up1_rq_hbm, g, wp, w_cells, chunk,
                          n_chunks, srows),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 2, 1024), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, xrows, 1024), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, xrows, 1024), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 1024), stage_dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(acc, ad)
    return slab, inv_s


# ------------------------------------------------------ reflect guard fill
#
# Reflected 256-map values are interior s2d cells with a LANE PERMUTATION:
# pixel row -k reflects to row k, so guard cell row -1's py blocks are
# [dc, py3, py2, py1] of cell row 0 (py0 = pixel row -4 is never read:
# pack_final_s2d16's |u|<=3 bound zeroes those weight taps). Columns are
# the same within 256-lane py blocks at 64-lane granularity, with the
# flattened-slab halo convention that (r, 71) holds the LEFT halo of cell
# row r+1 (the dJ=-1 tap from col 0 reads the previous slab row).
#
# Two XLA formulations were tried first and lost (28.7 / 14.5 ms at B=128:
# every functional update re-copies the ~600 MB slab); the shipping fill
# runs INSIDE the up1 kernel where the slab is already resident in VMEM —
# a row-guard write, one masked select pass for the cols, and a corner row.


def _py_top(x):
    """Lane perm: cell row -1 <- cell row 0 ([dc, py3, py2, py1])."""
    z = jnp.zeros_like(x[:, 0:256])
    return jnp.concatenate(
        [z, x[:, 768:1024], x[:, 512:768], x[:, 256:512]], axis=1)


def _py_bot(x):
    """Lane perm: cell row 64 <- cell row 63 ([py2, py1, py0, dc])."""
    z = jnp.zeros_like(x[:, 0:256])
    return jnp.concatenate(
        [x[:, 512:768], x[:, 256:512], x[:, 0:256], z], axis=1)


def _roll_m128(x):
    """out[l] = x[l+128] (mod 1024) — a 128-aligned two-piece concat, which
    both Mosaic and XLA lower natively (Mosaic rejects 64-lane concats)."""
    return jnp.concatenate([x[:, 128:], x[:, :128]], axis=1)


def _roll_p128(x):
    """out[l] = x[l-128] (mod 1024)."""
    return jnp.concatenate([x[:, 896:], x[:, :896]], axis=1)


def _px_quarter(x):
    """Lane index -> px quarter within the 256-lane py block (0..3)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jax.lax.rem(lane, 256) // 64


def _px_r(x):
    """Lane perm per py block: cell col 64 <- col 63 ([px2, px1, px0, dc]).

    dst px0 <- src px2 is +128 lanes within the block (never wraps for the
    quarters that use it), so the perm is two rolls + 64-lane-masked selects.
    """
    q = _px_quarter(x)
    return jnp.where(q == 0, _roll_m128(x),
                     jnp.where(q == 1, x,
                               jnp.where(q == 2, _roll_p128(x),
                                         jnp.zeros_like(x))))


def _px_l(x):
    """Lane perm per py block: cell col -1 <- col 0 ([dc, px3, px2, px1])."""
    q = _px_quarter(x)
    return jnp.where(q == 1, _roll_m128(x),
                     jnp.where(q == 2, x,
                               jnp.where(q == 3, _roll_p128(x),
                                         jnp.zeros_like(x))))


def reflect_guard_ref(slab: jax.Array, w_cells: int = 64) -> jax.Array:
    """Pure-JAX reference of the in-kernel guard fill (tests / CPU path).

    Takes a zero-guarded s2d-16 slab [B, g+srows+g, 1024] and returns it
    with the reflect guards filled exactly as :func:`_reflect_fill` does.
    """
    wp, srows, _, _, g = dec_geometry(w_cells)
    b, xrows, _ = slab.shape

    def one(s):
        s = s.at[g - wp:g].set(_py_top(s[g:g + wp]))
        s = s.at[g + srows:g + srows + wp].set(
            _py_bot(s[g + srows - wp:g + srows]))
        p0, pn = 8, xrows - 16
        rr = (jnp.arange(pn) + p0 - g + 2 * wp * g) % wp
        ext = s[p0:p0 + pn]
        out = jnp.where((rr == w_cells)[:, None],
                        _px_r(s[p0 - 1:p0 - 1 + pn]),
                        jnp.where((rr == wp - 1)[:, None],
                                  _px_l(s[p0 + 1:p0 + 1 + pn]), ext))
        s = s.at[p0:p0 + pn].set(out)
        return s.at[g - wp - 1].set(_px_l(s[g - wp:g - wp + 1])[0])

    return jax.vmap(one)(slab)


# --------------------------------------------------------- final conv7 site


def pack_final_s2d16(w_hwio, cch: int = 64) -> jax.Array:
    """[7,7,64,3] int8 conv kernel -> [9*1024, 48] offset-blocked rhs.

    Offset t=(dI,dJ) over the 64-grid; rhs rows are input lanes
    [r'(16)][ci(64)], cols are output lanes [s(16)][co(3)]. Entry is
    w[u+3, v+3, ci, co] with u = 4*dI + r'y - sy (valid iff |u|<=3).
    """
    w = np.asarray(w_hwio)
    assert w.shape[:2] == (7, 7) and w.shape[2] == cch
    cout = w.shape[3]
    packed = np.zeros((9 * 16 * cch, 16 * cout), np.int8)
    taps = [(dI, dJ) for dI in (-1, 0, 1) for dJ in (-1, 0, 1)]
    for t, (dI, dJ) in enumerate(taps):
        for rpy in range(4):
            for rpx in range(4):
                rblk = rpy * 4 + rpx
                for sy in range(4):
                    u = 4 * dI + rpy - sy
                    if not -3 <= u <= 3:
                        continue
                    for sx in range(4):
                        v = 4 * dJ + rpx - sx
                        if not -3 <= v <= 3:
                            continue
                        sblk = sy * 4 + sx
                        packed[t * 16 * cch + rblk * cch:
                               t * 16 * cch + (rblk + 1) * cch,
                               sblk * cout:(sblk + 1) * cout] = w[u + 3, v + 3]
    return jnp.asarray(packed)


def _kernel_final7(guard, wp, w_cells, chunk, n_chunks,
                   x_ref, w_ref, sv_ref, bias_ref, is_ref, o_ref):
    """9-tap conv7 on the s2d-16 slab + dequant + tanh + uint8, one sample.

    Mosaic cannot cast float->uint8, so the store is int8 holding the
    uint8 value's BITS (v-256 for v>127); :func:`unphase_s2d16_u8` then
    recovers uint8 with a free bitcast instead of an add pass.
    """
    valid = _valid_mask(chunk, wp, w_cells)
    offs = [dI * wp + dJ for dI in (-1, 0, 1) for dJ in (-1, 0, 1)]
    inv_s = is_ref[0, 0, 0]
    sv = sv_ref[0, :, :].astype(jnp.float32) * inv_s
    bias = bias_ref[0, :, :].astype(jnp.float32)
    for c in range(n_chunks):
        yc = None
        for t, off in enumerate(offs):
            lhs = x_ref[0, pl.ds(guard + c * chunk + off, chunk), :]
            d = jax.lax.dot_general(
                lhs, w_ref[t * 1024:(t + 1) * 1024, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            yc = d if yc is None else yc + d
        yf = jnp.tanh(yc.astype(jnp.float32) * sv + bias)
        v = jnp.clip(jnp.round((yf + 1.0) * 127.5), 0.0, 255.0)
        q = jnp.where(v > 127.0, v - 256.0, v).astype(jnp.int8)
        o_ref[0, pl.ds(c * chunk, chunk), :] = jnp.where(
            valid, q, jnp.int8(0))


def final7_tanh_u8(x_q: jax.Array, w_packed: jax.Array, wscale: jax.Array,
                   bias: jax.Array, inv_s: jax.Array,
                   w_cells: int = 64) -> jax.Array:
    """Reflect-guarded s2d-16 slab -> serving-ready uint8 s2d-16 [B,srows,48].

    wscale/bias: per-RGB-channel dequant scale and bias ([3] each, tiled to
    the 48 output lanes here); inv_s: [B,1,1] activation scale from up1.
    """
    wp, srows, chunk, n_chunks, g = dec_geometry(w_cells)
    bsz, xrows, cin = x_q.shape
    assert xrows == srows + 2 * g and cin == 1024
    assert w_packed.shape == (9 * 1024, 48)
    sv = jnp.tile(jnp.asarray(wscale, jnp.float32)[:3], 16)[None, None, :]
    bv = jnp.tile(jnp.asarray(bias, jnp.float32)[:3], 16)[None, None, :]
    return pl.pallas_call(
        functools.partial(_kernel_final7, g, wp, w_cells, chunk, n_chunks),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, xrows, 1024), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_packed.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 48), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 48), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, srows, 48), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, srows, 48), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(x_q, w_packed, sv, bv, inv_s)


def unphase_s2d16_u8(y: jax.Array, w_cells: int = 64) -> jax.Array:
    """[B, srows, 48] int8 (uint8 bits) s2d-16 -> [B, 4w, 4w, 3] uint8."""
    wp = w_cells + 8
    b = y.shape[0]
    v = jax.lax.bitcast_convert_type(y, jnp.uint8)
    v = v.reshape(b, w_cells, wp, 4, 4, 3)[:, :, :w_cells]
    v = v.transpose(0, 1, 3, 2, 4, 5)
    return v.reshape(b, 4 * w_cells, 4 * w_cells, 3)


def unphase_s2d16(y: jax.Array, cch: int = 64, w_cells: int = 64) -> jax.Array:
    """Guarded s2d-16 slab [B, g+srows+g, 16*cch] -> [B, 4w, 4w, cch]."""
    wp, srows, _, _, g = dec_geometry(w_cells)
    b = y.shape[0]
    v = y[:, g:g + srows, :].reshape(b, w_cells, wp, 4, 4, cch)[:, :, :w_cells]
    v = v.transpose(0, 1, 3, 2, 4, 5)
    return v.reshape(b, 4 * w_cells, 4 * w_cells, cch)
