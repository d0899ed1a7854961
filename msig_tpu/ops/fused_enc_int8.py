"""Fused int8 encoder kernels: the whole generator encoder on the 64-grid.

The XLA int8 encoder convs are the worst-utilized part of the quantized
generator (measured at B=128: conv0 ~14 ms, conv1 12.7 ms, conv2 6.1 ms vs
a ~3 ms combined MXU floor — strided/small-channel convs lower badly, and
the space-to-depth *XLA* reformulations lose too, tools/bench_enc_s2d.py).
These Pallas kernels instead express every encoder conv as dense shifted-
slice matmuls on ONE shared layout — the same ``[64*72 rows (+ guard), C]``
padded-row layout the fused trunk kernels use (ops/fused_conv_int8_v2.py) —
so the entire encoder chains kernel-to-kernel with only int8 in HBM and
feeds the trunk directly.

Layout key (all on the 64x64 "grid" of 4x4-pixel cells of the 256^2 image):

  * enc0 input:  s2d-4 of the reflect-padded image — [66*72 rows, 48]
    (48 = 4x4 pixel phases x RGB), built host^W XLA-side by
    :func:`prep_s2d4_input`.
  * enc0 output / enc1 input: [64-grid, 1024] where lanes are ordered
    b-major: [b(2x2: which 128-cell)][p(2x2: pixel in cell)][c(64)]. Each
    256-lane b-block is exactly the s2d-2 tile of one 128-grid cell, so
    enc1 reads 128-grid neighborhoods as 256-lane slices.
  * enc1 output / enc2 input: [64-grid, 512], lanes [b(2x2)][c(128)].
  * enc2 output: [64-grid, 256] — the fused trunk's input, unchanged.

Convolution = dense dot_generals on direct row-shifted, lane-sliced
operands (no im2col, no zero-block K): enc0 9 taps, enc1 4 output phases x
9 grid taps (2.25x K inflation, unavoidable when strided convs are phase-
packed), enc2 16 dense taps with NO inflation. Stride-2 semantics come out
of the phase bookkeeping in the weight packers; zero padding of the
original convs maps exactly onto the zero guard rows/columns.

Epilogue per kernel: instance-norm statistics folded across the phase
blocks of each original channel, ReLU, exact per-sample amax, dynamic
requant to int8 — identical structure to the trunk kernels.

Reference behavior replicated: the three encoder convs + IN + ReLU of
StyleCycleGANGenerator (/root/reference/model.py:130-134), int8-quantized
with scales/biases absorbed into IN (msig_tpu/infer/quantized.py docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msig_tpu.ops.fused_conv_int8_v2 import (
    GUARD,
    _interpret,
    _valid_mask,
    guard_rows,
)

_EPS = 1e-5
WP = 72            # padded row width of the 64-grid
SROWS = 64 * WP    # 4608
CHUNK = 16 * WP    # 1152
N_CHUNKS = 4

# enc0 input geometry: 66x66 grid (reflect-padded image), col-padded to 72
IN0_ROWS = 66 * WP          # 4752
IN0_SLAB = 67 * WP          # one whole slack cell row: the last chunk's +146
                            # tap offset stays in bounds, and prep emits the
                            # slab with a SINGLE pad (rows+cols in one copy)


def enc_geometry(w_cells: int):
    """(wp, srows, chunk, n_chunks, guard, in0_slab) for the w_cells grid.

    w_cells=64 covers 256^2 images (4x4-pixel cells), 128 covers 512^2.
    enc0's input slab has w_cells+2 live cell rows (reflect ring) plus one
    slack row so the last chunk's farthest tap offset stays in bounds.
    """
    wp = w_cells + 8
    srows = w_cells * wp
    chunk_cells = 16 if w_cells <= 64 else 8
    chunk = chunk_cells * wp
    assert srows % chunk == 0
    return wp, srows, chunk, srows // chunk, guard_rows(w_cells), \
        (w_cells + 3) * wp


def prep_s2d4_input(img_u8: jax.Array) -> jax.Array:
    """uint8 NHWC 256^2/512^2 image -> enc0's input slab [B, in0_slab, 48].

    Recenters (x-128, absorbing the reference's (x/127.5 - 1) normalization
    exactly as msig_tpu/infer/quantized.py does), reflect-pads by 4 (one
    pixel more than the conv needs; the extra ring only ever multiplies
    zero weights), and space-to-depths by 4 onto the (w_cells+2)^2 grid.
    """
    b, px = img_u8.shape[0], img_u8.shape[1]
    w_cells = px // 4
    wp, _, _, _, _, in0_slab = enc_geometry(w_cells)
    gc = w_cells + 2
    # x - 128 == x XOR 0x80 reinterpreted as int8: one bitwise pass instead
    # of a widen-subtract-narrow chain.
    x = jax.lax.bitcast_convert_type(img_u8 ^ jnp.uint8(128), jnp.int8)
    x = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
    # Row-phase gather instead of a 6-D byte transpose: rows r::4 of the
    # padded image reshaped to (gc, gc, 12) are pure row-major reshapes,
    # and the 4 phases concat on lanes. Bit-identical to the transpose
    # formulation; measured 15% faster at 256^2 and 29% at 512^2, where
    # the transpose hits a layout cliff (tools/bench_prep_variants.py,
    # round-4 log in docs/PERF.md).
    phases = [x[:, r::4].reshape(b, gc, gc, 12) for r in range(4)]
    x = jnp.concatenate(phases, axis=-1)
    x = jnp.pad(x, ((0, 0), (0, 1), (0, wp - gc), (0, 0)))
    return x.reshape(b, in0_slab, 48)


def _lane_b_major(qy: int, qx: int, c: int, cch: int = 64) -> int:
    """Output lane of enc0 for pixel phase (qy,qx) in its 4x4 cell, chan c."""
    b = (qy // 2) * 2 + (qx // 2)
    p = (qy % 2) * 2 + (qx % 2)
    return (b * 4 + p) * cch + c


def pack_enc0(w_i8: np.ndarray) -> jax.Array:
    """[7,7,3,64] int8 conv0 kernel -> [9*48, 1024] tap-blocked matmul rhs.

    Tap t=(dy,dx) over the 66-grid; rhs rows are the input lanes
    [py(4)][px(4)][ci(3)]; rhs cols are b-major output lanes. Entry is
    w[u,v,ci,co] where u = 4*dy + py + (3 - qy) ... solved as
    u = qy + u' - 3 = 4*dy + py  =>  u = 4*dy + py - qy + 3, valid in [0,7).
    """
    w = np.asarray(w_i8)
    assert w.shape == (7, 7, 3, 64)
    packed = np.zeros((9 * 48, 1024), np.int8)
    taps = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    for t, (dy, dx) in enumerate(taps):
        for py in range(4):
            for px in range(4):
                for qy in range(4):
                    u = 4 * dy + py - qy + 3
                    if not 0 <= u < 7:
                        continue
                    for qx in range(4):
                        v = 4 * dx + px - qx + 3
                        if not 0 <= v < 7:
                            continue
                        for ci in range(3):
                            packed[t * 48 + (py * 4 + px) * 3 + ci,
                                   _lane_b_major(qy, qx, 0) : _lane_b_major(qy, qx, 0) + 64] = \
                                w[u, v, ci]
    return jnp.asarray(packed)


# (DY, by) pairs realizing each in-cell offset value v = 2*DY + by
_V2DB = {-1: (-1, 1), 0: (0, 0), 1: (0, 1), 2: (1, 0)}


def pack_enc1(w_i8: np.ndarray) -> jax.Array:
    """[4,4,64,128] conv1 kernel -> [4*9*256, 128] (q-major, tap-blocked).

    Output b-phase q=(ay,ax) of a 64-cell is 128-cell (2I+ay, 2J+ax); its
    conv1 receptive field is 128-cells (ay+dy2, ax+dx2) for dy2,dx2 in
    {-1,0,1}, i.e. 64-grid rows (I+DY, J+DX) lane-block (by,bx), with
    (DY,by) = _V2DB[ay+dy2]. rhs rows within a block are the b-block's
    lanes [py2(2)][px2(2)][ci(64)]; the weight tap is u = 2*dy2 + py2 + 1.
    """
    w = np.asarray(w_i8)
    assert w.shape == (4, 4, 64, 128)
    packed = np.zeros((4 * 9 * 256, 128), np.int8)
    blk = 0
    for ay in (0, 1):
        for ax in (0, 1):
            for dy2 in (-1, 0, 1):
                for dx2 in (-1, 0, 1):
                    for py2 in (0, 1):
                        u = 2 * dy2 + py2 + 1
                        if not 0 <= u < 4:
                            continue
                        for px2 in (0, 1):
                            v = 2 * dx2 + px2 + 1
                            if not 0 <= v < 4:
                                continue
                            r0 = blk * 256 + (py2 * 2 + px2) * 64
                            packed[r0:r0 + 64, :] = w[u, v]
                    blk += 1
    return jnp.asarray(packed)


def _enc1_phase_slices(ay: int, ax: int, wp: int):
    """The 16 (row offset, lane offset) source slices of output phase
    (ay,ax)'s dense K=1024 im2col block, in kernel-row order u*4+v.

    For each kernel row u = 2*dy2 + py2 + 1 there is exactly ONE valid
    (dy2, py2) combo per ay (and same for columns), so the dense gather
    has no duplicated or zero K rows — this is what removes the 2.25x
    K inflation of the 9-tap phase-packed form.
    """
    def combos(a):
        out = {}
        for d in (-1, 0, 1):
            DY, by = _V2DB[a + d]
            for p in (0, 1):
                u = 2 * d + p + 1
                if 0 <= u < 4:
                    out[u] = (DY, by, p)
        return [out[u] for u in range(4)]

    rows = combos(ay)
    cols = combos(ax)
    slices = []
    for (DY, by, py2) in rows:
        for (DX, bx, px2) in cols:
            roff = DY * wp + DX
            loff = ((by * 2 + bx) * 4 + (py2 * 2 + px2)) * 64
            slices.append((roff, loff))
    return slices


def pack_enc1_im2col(w_i8: np.ndarray) -> jax.Array:
    """[4,4,64,128] conv1 kernel -> [4*1024, 128] dense im2col rhs.

    Phase-major; within each phase the 16 64-row blocks follow kernel-row
    order u*4+v (matching :func:`_enc1_phase_slices`), so block (u,v) is
    simply w[u, v].
    """
    w = np.asarray(w_i8)
    assert w.shape == (4, 4, 64, 128)
    packed = np.zeros((4 * 16 * 64, 128), np.int8)
    blk = 0
    for _ay in (0, 1):
        for _ax in (0, 1):
            for u in range(4):
                for v in range(4):
                    packed[blk * 64:(blk + 1) * 64, :] = w[u, v]
                    blk += 1
    return jnp.asarray(packed)


def pack_enc2(w_i8: np.ndarray) -> jax.Array:
    """[4,4,128,256] conv2 kernel -> [16*128, 256] tap-blocked.

    Output 64-cell (I,J) reads 128-map values at in-cell offsets
    u-1 = 2*DY + by, i.e. 16 dense taps (DY,by) x (DX,bx) — no inflation.
    Block order: [(DY,by) for u in 0..3] x [(DX,bx) for v in 0..3].
    """
    w = np.asarray(w_i8)
    assert w.shape == (4, 4, 128, 256)
    packed = np.zeros((16 * 128, 256), np.int8)
    blk = 0
    for u in range(4):
        for v in range(4):
            packed[blk * 128:(blk + 1) * 128, :] = w[u, v]
            blk += 1
    return jnp.asarray(packed)


def _epilogue_in_relu_requant(acc, o_ref, valid, fold, n, ntot, guard, srows,
                              chunk, eps, sums, sumsq, cmin, cmax,
                              os_ref=None):
    """Shared IN(+phase fold)+ReLU+requant epilogue over the acc slab."""
    c = ntot // fold

    def _fold(v):
        out = v[:, 0:c]
        for k in range(1, fold):
            out = out + v[:, k * c:(k + 1) * c]
        return out

    mean_c = _fold(sums) / n
    sq_c = _fold(sumsq) / n
    var_c = jnp.maximum(sq_c - mean_c * mean_c, 0.0)
    a_c = jax.lax.rsqrt(var_c + eps)
    d_c = -mean_c * a_c
    if fold > 1:
        a = jnp.concatenate([a_c] * fold, axis=1)
        d = jnp.concatenate([d_c] * fold, axis=1)
    else:
        a, d = a_c, d_c
    hi = jnp.maximum(a * cmax, a * cmin) + d
    amax = jnp.max(jnp.maximum(hi, 0.0))
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    if os_ref is not None:
        os_ref[0, 0, 0] = jnp.where(amax > 0, amax / 127.0, 1.0)
    a2 = a * s  # fold requant scale into the affine (slim epilogue)
    d2 = d * s

    n_chunks = srows // chunk
    for ci in range(n_chunks):
        xf = acc[pl.ds(ci * chunk, chunk), :].astype(jnp.float32)
        y = jnp.minimum(jnp.maximum(xf * a2 + d2, 0.0), 127.0)
        q = jnp.round(y).astype(jnp.int8)
        o_ref[0, pl.ds(guard + ci * chunk, chunk), :] = jnp.where(
            valid, q, jnp.int8(0))
    o_ref[0, pl.ds(0, guard), :] = jnp.zeros((guard, ntot), jnp.int8)
    o_ref[0, pl.ds(guard + srows, guard), :] = jnp.zeros((guard, ntot), jnp.int8)


# Slim per-chunk stats update (MXU-offloaded sums, zero-anchored min/max) —
# shared with the trunk/decoder kernels.
from msig_tpu.ops.fused_conv_int8_v2 import _stats_update_slim as _stats_update  # noqa: E402
from msig_tpu.ops.fused_dec_int8 import STAGE_SCALE  # noqa: E402


def _kernel_enc0(eps, w_cells, x_ref, w_ref, o_ref, acc, col):
    """enc0: 9-tap s2d-4 conv (48 -> 1024 lanes) + IN(fold16) + ReLU + rq.

    K=48 per-tap matmuls fill only 48/128 of the MXU's systolic depth
    (measured ~23% MXU); the taps are im2col'd into a [chunk, 432] VMEM
    scratch so each chunk is ONE K=432 matmul.
    """
    wp, srows, chunk, n_chunks, g, _ = enc_geometry(w_cells)
    valid = _valid_mask(chunk, wp, w_cells)
    sums = jnp.zeros((1, 1024), jnp.float32)
    sumsq = jnp.zeros((1, 1024), jnp.float32)
    cmin = jnp.full((1, 1024), jnp.inf, jnp.float32)
    cmax = jnp.full((1, 1024), -jnp.inf, jnp.float32)
    offs = [(dy + 1) * wp + (dx + 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    for c in range(n_chunks):
        for t, off in enumerate(offs):
            col[:, t * 48:(t + 1) * 48] = x_ref[0, pl.ds(c * chunk + off, chunk), :]
        yc = jax.lax.dot_general(
            col[:, :], w_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc[pl.ds(c * chunk, chunk), :] = yc
        sums, sumsq, cmin, cmax = _stats_update(yc, valid, sums, sumsq, cmin, cmax)
    # stats fold 16 phase blocks of 64 channels; spatial n = (4w)^2 per chan
    _epilogue_in_relu_requant(acc, o_ref, valid, 16,
                              float(w_cells * w_cells * 16), 1024,
                              g, srows, chunk, eps, sums, sumsq, cmin, cmax)


def _kernel_enc1(eps, w_cells, x_ref, w_ref, o_ref, acc):
    """enc1: 4 phases x 9 grid taps (256-lane slices) -> 512 lanes."""
    wp, srows, chunk, n_chunks, g, _ = enc_geometry(w_cells)
    valid = _valid_mask(chunk, wp, w_cells)
    sums = jnp.zeros((1, 512), jnp.float32)
    sumsq = jnp.zeros((1, 512), jnp.float32)
    cmin = jnp.full((1, 512), jnp.inf, jnp.float32)
    cmax = jnp.full((1, 512), -jnp.inf, jnp.float32)
    for c in range(n_chunks):
        phases = []
        blk = 0
        for ay in (0, 1):
            for ax in (0, 1):
                aq = None
                for dy2 in (-1, 0, 1):
                    DY, by = _V2DB[ay + dy2]
                    for dx2 in (-1, 0, 1):
                        DX, bx = _V2DB[ax + dx2]
                        bblk = by * 2 + bx
                        lhs = x_ref[0,
                                    pl.ds(g + c * chunk + DY * wp + DX, chunk),
                                    bblk * 256:(bblk + 1) * 256]
                        d = jax.lax.dot_general(
                            lhs, w_ref[blk * 256:(blk + 1) * 256, :],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )
                        aq = d if aq is None else aq + d
                        blk += 1
                phases.append(aq)
        yc = jnp.concatenate(phases, axis=1)
        acc[pl.ds(c * chunk, chunk), :] = yc
        sums, sumsq, cmin, cmax = _stats_update(yc, valid, sums, sumsq, cmin, cmax)
    # fold the 4 b-blocks; spatial n = (2w)^2 per channel
    _epilogue_in_relu_requant(acc, o_ref, valid, 4,
                              float(w_cells * w_cells * 4), 512,
                              g, srows, chunk, eps, sums, sumsq, cmin, cmax)


def _kernel_enc1_im2col(eps, w_cells, x_ref, w_ref, o_ref, acc, col):
    """enc1 as 4 dense K=1024 matmuls per chunk (im2col gather).

    The phase-packed form pays 9 taps x 256 lanes = 2304 MAC-K per output
    phase where the conv's true K is 4x4x64 = 1024 (2.25x inflation,
    VERDICT r2 lever). Here the exactly-needed 16 64-lane slices are
    gathered into a [chunk, 1024] VMEM scratch per phase — same scheme
    that lifted enc0 from 23% MXU.
    """
    wp, srows, chunk, n_chunks, g, _ = enc_geometry(w_cells)
    valid = _valid_mask(chunk, wp, w_cells)
    sums = jnp.zeros((1, 512), jnp.float32)
    sumsq = jnp.zeros((1, 512), jnp.float32)
    cmin = jnp.full((1, 512), jnp.inf, jnp.float32)
    cmax = jnp.full((1, 512), -jnp.inf, jnp.float32)
    slices = [_enc1_phase_slices(ay, ax, wp)
              for ay in (0, 1) for ax in (0, 1)]
    for c in range(n_chunks):
        phases = []
        for q, sl in enumerate(slices):
            for k, (roff, loff) in enumerate(sl):
                col[:, k * 64:(k + 1) * 64] = x_ref[
                    0, pl.ds(g + c * chunk + roff, chunk), loff:loff + 64]
            d = jax.lax.dot_general(
                col[:, :], w_ref[q * 1024:(q + 1) * 1024, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            phases.append(d)
        yc = jnp.concatenate(phases, axis=1)
        acc[pl.ds(c * chunk, chunk), :] = yc
        sums, sumsq, cmin, cmax = _stats_update(yc, valid, sums, sumsq,
                                                cmin, cmax)
    _epilogue_in_relu_requant(acc, o_ref, valid, 4,
                              float(w_cells * w_cells * 4), 512,
                              g, srows, chunk, eps, sums, sumsq, cmin, cmax)


def _kernel_enc2(eps, w_cells, x_ref, w_ref, o_ref, os_ref, acc):
    """enc2: 16 dense taps (128-lane slices) -> 256 lanes (trunk layout)."""
    wp, srows, chunk, n_chunks, g, _ = enc_geometry(w_cells)
    valid = _valid_mask(chunk, wp, w_cells)
    sums = jnp.zeros((1, 256), jnp.float32)
    sumsq = jnp.zeros((1, 256), jnp.float32)
    cmin = jnp.full((1, 256), jnp.inf, jnp.float32)
    cmax = jnp.full((1, 256), -jnp.inf, jnp.float32)
    pairs = [_V2DB[v - 1] for v in range(4)]  # (DY,by) for u = 0..3
    for c in range(n_chunks):
        yc = None
        blk = 0
        for (DY, by) in pairs:
            for (DX, bx) in pairs:
                bblk = by * 2 + bx
                lhs = x_ref[0,
                            pl.ds(g + c * chunk + DY * wp + DX, chunk),
                            bblk * 128:(bblk + 1) * 128]
                d = jax.lax.dot_general(
                    lhs, w_ref[blk * 128:(blk + 1) * 128, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                yc = d if yc is None else yc + d
                blk += 1
        acc[pl.ds(c * chunk, chunk), :] = yc
        sums, sumsq, cmin, cmax = _stats_update(yc, valid, sums, sumsq, cmin, cmax)
    _epilogue_in_relu_requant(acc, o_ref, valid, 1, float(w_cells * w_cells),
                              256, g, srows, chunk, eps, sums, sumsq, cmin,
                              cmax, os_ref=os_ref)


def _kernel_enc0_conv_hbm(w_cells, x_ref, w_ref, acc_hbm, st_ref, col, buf,
                          sems):
    """enc0 conv + stats at the 128-grid: im2col chunks drain to HBM.

    When the staged accumulator is fp16 (MSIG_STAGE_FP16=1), chunks are
    scaled by 2^-12 before the drain — stats stay EXACT (computed from the
    int32 chunk); only the requant pass sees the ~2^-11-relative staging
    noise (<= 1/16 of an int8 code step). Halves the HBM round trip
    (VERDICT r4 #3)."""
    wp, srows, chunk, n_chunks, _, _ = enc_geometry(w_cells)
    i = pl.program_id(0)
    valid = _valid_mask(chunk, wp, w_cells)
    fp16 = buf.dtype == jnp.float16
    sums = jnp.zeros((1, 1024), jnp.float32)
    sumsq = jnp.zeros((1, 1024), jnp.float32)
    cmin = jnp.full((1, 1024), jnp.inf, jnp.float32)
    cmax = jnp.full((1, 1024), -jnp.inf, jnp.float32)
    offs = [(dy + 1) * wp + (dx + 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    pending = [None, None]
    for c in range(n_chunks):
        slot = c % 2
        if pending[slot] is not None:
            pending[slot].wait()
        for t, off in enumerate(offs):
            col[:, t * 48:(t + 1) * 48] = x_ref[0, pl.ds(c * chunk + off, chunk), :]
        yc = jax.lax.dot_general(
            col[:, :], w_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if fp16:
            buf[slot] = (yc.astype(jnp.float32)
                         * jnp.float32(STAGE_SCALE)).astype(jnp.float16)
        else:
            buf[slot] = yc
        dma = pltpu.make_async_copy(
            buf.at[slot], acc_hbm.at[i, pl.ds(c * chunk, chunk), :],
            sems.at[slot])
        dma.start()
        pending[slot] = dma
        sums, sumsq, cmin, cmax = _stats_update(yc, valid, sums, sumsq,
                                                cmin, cmax)
    for dma in pending:
        dma.wait()
    st_ref[0, 0:1, :] = sums
    st_ref[0, 1:2, :] = sumsq
    st_ref[0, 2:3, :] = cmin
    st_ref[0, 3:4, :] = cmax


def _kernel_enc0_rq_hbm(w_cells, acc_hbm, ad_ref, o_ref, buf, sems):
    """Requant the staged int32 chunks into the zero-guarded output slab."""
    wp, srows, chunk, n_chunks, g, _ = enc_geometry(w_cells)
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
        o_ref[0, pl.ds(g + c * chunk, chunk), :] = jnp.where(
            valid, q, jnp.int8(0))
    o_ref[0, pl.ds(0, g), :] = jnp.zeros((g, 1024), jnp.int8)
    o_ref[0, pl.ds(g + srows, g), :] = jnp.zeros((g, 1024), jnp.int8)


def _enc0_hbm(x_slab, w_packed, eps, w_cells):
    """HBM-staged enc0 (same scheme as ops/fused_dec_int8.up1_s2d16_hbm):
    conv+stats kernel -> XLA IN fold16 -> requant kernel."""
    from msig_tpu.ops.fused_dec_int8 import STAGE_SCALE, _up1_scales, stage_dtype

    wp, srows, chunk, n_chunks, g, in0_slab = enc_geometry(w_cells)
    bsz = x_slab.shape[0]
    out_rows = srows + 2 * g
    stage_dt = stage_dtype()
    acc, stats = pl.pallas_call(
        functools.partial(_kernel_enc0_conv_hbm, w_cells),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, in0_slab, 48), lambda i: (i, 0, 0),
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
            pltpu.VMEM((chunk, 9 * 48), jnp.int8),
            pltpu.VMEM((2, chunk, 1024), stage_dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x_slab, w_packed)

    ad, _ = _up1_scales(stats, float(w_cells * w_cells * 16), eps)
    if stage_dt == jnp.float16:
        # Staged chunks carry a 2^-12 pre-scale; fold its inverse into a2
        # (y = xf_staged * (a2/STAGE_SCALE) + d2) — zero extra kernel ops.
        ad = ad.at[:, 0, :].multiply(1.0 / STAGE_SCALE)

    return pl.pallas_call(
        functools.partial(_kernel_enc0_rq_hbm, w_cells),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 2, 1024), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_rows, 1024), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, out_rows, 1024), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 1024), stage_dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(acc, ad)


def _call(kernel, x, w, ntot, in_rows, eps, w_cells, extra_scratch=()):
    bsz = x.shape[0]
    _, srows, _, _, g, _ = enc_geometry(w_cells)
    out_rows = srows + 2 * g
    return pl.pallas_call(
        functools.partial(kernel, eps, w_cells),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, in_rows, x.shape[2]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_rows, ntot), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, out_rows, ntot), jnp.int8),
        scratch_shapes=[pltpu.VMEM((srows, ntot), jnp.int32), *extra_scratch],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(x, w)


def enc0_in_relu_requant(x_slab, w_packed, eps: float = _EPS,
                         w_cells: int = 64):
    """[B, in0_slab, 48] int8 -> [B, srows+2g, 1024] int8 (b-major).

    At w_cells=128 (512^2) the int32 accumulator slab exceeds VMEM, so the
    site runs as the HBM-staged kernel pair (same scheme as
    ops/fused_dec_int8.up1_s2d16_hbm).
    """
    wp, srows, chunk, n_chunks, g, in0_slab = enc_geometry(w_cells)
    assert x_slab.shape[1:] == (in0_slab, 48)
    assert w_packed.shape == (9 * 48, 1024)
    if w_cells > 64:
        return _enc0_hbm(x_slab, w_packed, eps, w_cells)
    return _call(_kernel_enc0, x_slab, w_packed, 1024, in0_slab, eps, w_cells,
                 extra_scratch=(pltpu.VMEM((chunk, 9 * 48), jnp.int8),))


def enc1_in_relu_requant(x, w_packed, eps: float = _EPS, w_cells: int = 64):
    """[B, srows+2g, 1024] -> [B, srows+2g, 512] int8 (b-major)."""
    _, srows, _, _, g, _ = enc_geometry(w_cells)
    assert x.shape[1:] == (srows + 2 * g, 1024)
    assert w_packed.shape == (4 * 9 * 256, 128)
    return _call(_kernel_enc1, x, w_packed, 512, srows + 2 * g, eps, w_cells)


def enc1_in_relu_requant_im2col(x, w_packed, eps: float = _EPS,
                                w_cells: int = 64):
    """enc1 via dense im2col (pack_enc1_im2col weights) — exact-int
    equivalent of :func:`enc1_in_relu_requant`, 2.25x fewer MXU MACs."""
    wp, srows, chunk, _, g, _ = enc_geometry(w_cells)
    assert x.shape[1:] == (srows + 2 * g, 1024)
    assert w_packed.shape == (4 * 1024, 128)
    return _call(_kernel_enc1_im2col, x, w_packed, 512, srows + 2 * g, eps,
                 w_cells,
                 extra_scratch=(pltpu.VMEM((chunk, 1024), jnp.int8),))


def enc2_in_relu_requant(x, w_packed, eps: float = _EPS, w_cells: int = 64):
    """[B, srows+2g, 512] -> ([B, srows+2g, 256] int8 (trunk layout),
    inv_scale [B,1,1] f32 — the residual carry's dequant scale)."""
    _, srows, _, _, g, _ = enc_geometry(w_cells)
    assert x.shape[1:] == (srows + 2 * g, 512)
    assert w_packed.shape == (16 * 128, 256)
    bsz = x.shape[0]
    out_rows = srows + 2 * g
    return pl.pallas_call(
        functools.partial(_kernel_enc2, eps, w_cells),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, out_rows, 512), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, out_rows, 256), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, out_rows, 256), jnp.int8),
            jax.ShapeDtypeStruct((bsz, 1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((srows, 256), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(x, w_packed)
