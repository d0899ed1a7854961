"""v3 trunk kernel: N resblocks (conv1+conv2 each) in ONE pallas_call.

Round-2 shipped the trunk as 16 pallas_call sites (8 resblocks x 2 convs,
ops/fused_conv_int8_v2.py) at ~61% MXU — the remaining overhead being
(a) an int8 HBM write + read of the full activation slab at every site
boundary (15 boundaries x 2.5 MB/sample) and (b) per-site VPU epilogue
passes (requant stores) that cannot overlap the next site's matmuls across
a pallas_call boundary. This kernel keeps the ENTIRE residual trunk of one
sample resident in VMEM:

  * All 2N conv sites run back-to-back inside one program; between sites
    nothing touches HBM (weights are fetched once per program and reused —
    Mosaic keeps the constant-indexed blocks resident across the grid).
  * conv1's requant pass is interleaved into conv2's per-chunk matmul
    stream (requant chunk c+2 is issued between conv2 chunks — VPU work
    the scheduler can overlap with MXU accumulation), and conv2's store
    pass is likewise interleaved into the NEXT block's conv1 matmuls.
  * The residual carry scale hs lives in a register, not SMEM round trips.

Numerics are bit-identical to chaining ops/fused_conv_int8_v2.py's
conv3x3_adain_relu_requant + conv3x3_adain_residual_requant (same layout,
same fp32 stats, same exact amax) — asserted by tests/test_fused_trunk_v3.py.

Replicates the int8-quantized form of the reference's 8 AdaIN resblocks
(/root/reference/model.py:38-55,136-141); see msig_tpu/infer/quantized.py
for why no dequantization scales appear.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msig_tpu.ops.fused_conv_int8_v2 import (
    _interpret,
    _valid_mask,
    geometry,
    guard_rows,
)

_EPS = 1e-5


def _conv_chunk(src, w_ref, w_off, cin, start, offs, chunk):
    """9 shifted-slice int8 matmuls accumulated in int32 for one chunk."""
    acc = None
    for t, off in enumerate(offs):
        lhs = src[0, pl.ds(start + off, chunk), :]
        d = jax.lax.dot_general(
            lhs, w_ref[pl.ds(w_off + t * cin, cin), :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = d if acc is None else acc + d
    return acc


def _kernel(eps, n_blocks, cin, wp, w_img, srows, chunk, guard,
            x_ref, hs_ref, w_ref, g_ref, b_ref, o_ref, os_ref,
            h_a, h_b, y1, acc1, acc2):
    """N fused resblocks on one sample's guard-padded slab.

    Scratch:
      h_a/h_b: [srows+2*guard, cin] int8 ping-pong residual slabs
      y1:      [srows+2*guard, cin] int8 conv1 output
      acc1/acc2: [srows, cin] int32 raw conv accumulators
    """
    n_chunks = srows // chunk
    offs = [dy * wp + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    valid = _valid_mask(chunk, wp, w_img)
    n = float(w_img * w_img)
    zero_g = jnp.zeros((guard, cin), jnp.int8)

    # Zero the guard rows of every int8 scratch once; bodies are always
    # fully overwritten with guard-column masking before being read.
    for ref in (h_a, h_b, y1):
        ref[0, pl.ds(0, guard), :] = zero_g
        ref[0, pl.ds(guard + srows, guard), :] = zero_g

    hs = hs_ref[0, 0, 0]
    cur = None  # None = block input is x_ref; else one of h_a/h_b

    for blk in range(n_blocks):
        src = x_ref if cur is None else cur
        w1_off = (2 * blk) * (9 * cin)
        w2_off = (2 * blk + 1) * (9 * cin)
        g1 = g_ref[0, 2 * blk, :][None, :].astype(jnp.float32)
        b1 = b_ref[0, 2 * blk, :][None, :].astype(jnp.float32)
        g2 = g_ref[0, 2 * blk + 1, :][None, :].astype(jnp.float32)
        b2 = b_ref[0, 2 * blk + 1, :][None, :].astype(jnp.float32)

        # ---- conv1: matmuls + stats (sum/sumsq/min/max) -------------------
        sums = jnp.zeros((1, cin), jnp.float32)
        sumsq = jnp.zeros((1, cin), jnp.float32)
        cmin = jnp.full((1, cin), jnp.inf, jnp.float32)
        cmax = jnp.full((1, cin), -jnp.inf, jnp.float32)
        for c in range(n_chunks):
            yc = _conv_chunk(src, w_ref, w1_off, cin, guard + c * chunk, offs, chunk)
            acc1[pl.ds(c * chunk, chunk), :] = yc
            xf = jnp.where(valid, yc.astype(jnp.float32), 0.0)
            sums = sums + jnp.sum(xf, axis=0, keepdims=True)
            sumsq = sumsq + jnp.sum(xf * xf, axis=0, keepdims=True)
            xv = jnp.where(valid, yc.astype(jnp.float32), jnp.inf)
            cmin = jnp.minimum(cmin, jnp.min(xv, axis=0, keepdims=True))
            xv = jnp.where(valid, yc.astype(jnp.float32), -jnp.inf)
            cmax = jnp.maximum(cmax, jnp.max(xv, axis=0, keepdims=True))
        mean = sums / n
        var = jnp.maximum(sumsq / n - mean * mean, 0.0)
        a1 = g1 * jax.lax.rsqrt(var + eps)
        d1 = b1 - mean * a1
        # exact post-ReLU amax from per-channel raw extremes
        hi = jnp.maximum(a1 * cmax, a1 * cmin) + d1
        amax1 = jnp.max(jnp.maximum(hi, 0.0))
        s1 = jnp.where(amax1 > 0, 127.0 / amax1, 1.0)

        def _rq1(c):
            xf = acc1[pl.ds(c * chunk, chunk), :].astype(jnp.float32)
            yq = jnp.maximum(xf * a1 + d1, 0.0) * s1
            q = jnp.clip(jnp.round(yq), -127.0, 127.0).astype(jnp.int8)
            y1[0, pl.ds(guard + c * chunk, chunk), :] = jnp.where(
                valid, q, jnp.int8(0))

        # ---- conv2 matmuls interleaved with conv1 requant ----------------
        # conv2 chunk c reads y1 rows up to (c+1)*chunk + wp + 1, i.e. needs
        # y1 chunks 0..c+1 — requant stays one chunk ahead so the scheduler
        # can overlap the VPU requant of chunk c+2 with chunk c's matmuls.
        _rq1(0)
        if n_chunks > 1:
            _rq1(1)
        sums2 = jnp.zeros((1, cin), jnp.float32)
        sumsq2 = jnp.zeros((1, cin), jnp.float32)
        for c in range(n_chunks):
            yc = _conv_chunk(y1, w_ref, w2_off, cin, guard + c * chunk, offs, chunk)
            if c + 2 < n_chunks:
                _rq1(c + 2)
            acc2[pl.ds(c * chunk, chunk), :] = yc
            xf = jnp.where(valid, yc.astype(jnp.float32), 0.0)
            sums2 = sums2 + jnp.sum(xf, axis=0, keepdims=True)
            sumsq2 = sumsq2 + jnp.sum(xf * xf, axis=0, keepdims=True)
        mean2 = sums2 / n
        var2 = jnp.maximum(sumsq2 / n - mean2 * mean2, 0.0)
        a2 = g2 * jax.lax.rsqrt(var2 + eps)
        d2 = b2 - mean2 * a2

        # ---- residual add: exact amax pass, then requant+store ----------
        amax2 = jnp.float32(0.0)
        for c in range(n_chunks):
            xf = acc2[pl.ds(c * chunk, chunk), :].astype(jnp.float32)
            hf = src[0, pl.ds(guard + c * chunk, chunk), :].astype(jnp.float32) * hs
            hn = jnp.where(valid, xf * a2 + d2 + hf, 0.0)
            amax2 = jnp.maximum(amax2, jnp.max(jnp.abs(hn)))
        s2 = jnp.where(amax2 > 0, 127.0 / amax2, 1.0)
        new_hs = jnp.where(amax2 > 0, amax2 / 127.0, 1.0)

        dst = o_ref if blk == n_blocks - 1 else (h_a if cur is not h_a else h_b)
        for c in range(n_chunks):
            xf = acc2[pl.ds(c * chunk, chunk), :].astype(jnp.float32)
            hf = src[0, pl.ds(guard + c * chunk, chunk), :].astype(jnp.float32) * hs
            hn = (xf * a2 + d2 + hf) * s2
            q = jnp.clip(jnp.round(hn), -127.0, 127.0).astype(jnp.int8)
            dst[0, pl.ds(guard + c * chunk, chunk), :] = jnp.where(
                valid, q, jnp.int8(0))
        hs = new_hs
        cur = dst

    o_ref[0, pl.ds(0, guard), :] = zero_g
    o_ref[0, pl.ds(guard + srows, guard), :] = zero_g
    os_ref[0, 0, 0] = hs


def fused_trunk_blocks(x_q, h_scale, w_stack, gammas, betas,
                       n_blocks: int, w_img: int = 64, eps: float = _EPS,
                       chunk_rows: int = 16):
    """Run ``n_blocks`` fused AdaIN resblocks in one Pallas kernel.

    Args:
      x_q: [B, guard + w_img*(w_img+8) + guard, C] int8 guard-padded slab
        (layout of ops/fused_conv_int8_v2.to_padded_rows).
      h_scale: [B, 1] float32 — dequant scale of ``x_q`` (the residual carry).
      w_stack: [2*n_blocks*9*C, C] int8 — per-site packed weights
        (fused_conv_int8.pack_weights outputs, concatenated site-major:
        block0.conv1, block0.conv2, block1.conv1, ...).
      gammas, betas: [B, 2*n_blocks, C] float32 AdaIN affines, site-major.

    Returns:
      (out_slab int8 [B, rows, C], out_scale float32 [B, 1]).
    """
    wp, srows, chunk, _ = geometry(w_img, chunk_rows)
    g = guard_rows(w_img)
    bsz, xrows, cin = x_q.shape
    assert xrows == srows + 2 * g
    assert w_stack.shape == (2 * n_blocks * 9 * cin, cin), w_stack.shape
    assert gammas.shape == (bsz, 2 * n_blocks, cin)
    kernel = functools.partial(
        _kernel, eps, n_blocks, cin, wp, w_img, srows, chunk, g)
    out, out_s = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(w_stack.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * n_blocks, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * n_blocks, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, xrows, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, xrows, cin), jnp.int8),
            jax.ShapeDtypeStruct((bsz, 1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, xrows, cin), jnp.int8),   # h_a
            pltpu.VMEM((1, xrows, cin), jnp.int8),   # h_b
            pltpu.VMEM((1, xrows, cin), jnp.int8),   # y1
            pltpu.VMEM((srows, cin), jnp.int32),     # acc1
            pltpu.VMEM((srows, cin), jnp.int32),     # acc2
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x_q, h_scale.reshape(bsz, 1, 1), w_stack, gammas, betas)
    return out, out_s.reshape(bsz, 1)


def pack_trunk_weights(q, n_blocks: int) -> jax.Array:
    """Concatenate the per-site packed weights [9C, C] site-major."""
    ws = []
    for i in range(n_blocks):
        ws.append(q[f"res{i}_conv1_p"])
        ws.append(q[f"res{i}_conv2_p"])
    return jnp.concatenate(ws, axis=0)
