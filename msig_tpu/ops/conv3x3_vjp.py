"""Fused Pallas backward (dx + dW in one pass) for 3x3 stride-1 SAME convs.

Why this exists (VERDICT r4 #1): the b32 train step sits AT the no-overlap
roofline sum (docs/PERF.md "Train step, batch 32"), and its dominant slab is
the generator-trunk conv3x3 backward — ~80 site-calls per step (8 resblocks
x 2 convs x 5 differentiated generator forwards, reference trainer.py:91-128
-> msig_tpu/train/step.py). XLA lowers each site to TWO kernels (dgrad +
wgrad) that each re-read the big activation slabs from HBM; this kernel
computes BOTH cotangents in ONE pass over the data:

    read  x, dy          (once)
    write dx, dW-partial (once)

with the per-image slabs resident in VMEM and the next image's slabs
prefetched by the Pallas grid pipeline while the MXU works — the
compute/memory overlap the roofline analysis priced.

Math (NHWC, HWIO, stride 1, zero SAME padding):
    y[p]  = sum_t x[p + off_t] @ W_t          W_t = W[di, dj] in [Cin, Cout]
    dx[q] = sum_t dy[q - off_t] @ W_t^T
    dW_t  = sum_p x[p + off_t]^T dy[p]

Both reductions run as MXU matmuls over zero-padded flattened slabs
(8 pad columns between rows + 2 guard rows, same trick as the int8 forward
kernels in ops/fused_conv_int8_v2.py) so the 9 tap shifts become plain row
offsets with automatic SAME-padding boundary zeros. All tap reads are flat
2-D ref loads (``ref[pl.ds(start, n), :]``) — the access pattern the
in-repo int8 kernels have proven on Mosaic.

The ``*_adain`` units additionally fold the FOLLOWING AdaIN's IN+modulate
backward into the same kernel (the reference's resblock sites,
model.py:38-55): the incoming cotangent and the saved conv output stay in
VMEM, and XLA's separate dy buffer + reduction kernels disappear.

The reference delegates all of this to cuDNN/torch-autograd
(reference model.py:38-55); it has no custom backward of its own.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# Padded geometry: W -> WP = W + 8 zero columns; 2 guard rows top/bottom
# (tap row-offsets reach +-(WP+1) from any body row).
_GUARD = 2
_IN_EPS = 1e-5  # torch nn.InstanceNorm2d default (ops/norm.py)


def _geom(h: int, w: int):
    wp = w + 8
    rows = (h + 2 * _GUARD) * wp
    body0 = _GUARD * wp
    return wp, rows, body0


def _stage_rows(dst_ref, src_ref, h, w, wp, body0, relu=False):
    """Image body [1,h,w,c] -> flat padded rows (pads/guards stay zero).

    The relu runs through an f32 round trip: Mosaic on this target rejects
    bf16 comparisons/maximum ("Target does not support this comparison")."""
    for r in range(h):
        row = src_ref[0, r]
        if relu:
            rf = row.astype(jnp.float32)
            row = jnp.maximum(rf, 0.0).astype(src_ref.dtype)
        dst_ref[pl.ds(body0 + r * wp, w), :] = row


def _conv_bwd_core(xp_ref, dyp_ref, wt_ref, dx_ref, dw_ref,
                   h, w, c, cout, rows_per_chunk, relu_input):
    """dx + dW from staged padded slabs (shared by both kernel families)."""
    wp, rows, body0 = _geom(h, w)
    n_body = h * wp
    offs = [(di - 1) * wp + (dj - 1) for di in range(3) for dj in range(3)]

    # dx in row-chunks: 9 taps of [chunk, Cout] @ [Cout, Cin], fp32 accum.
    for r0 in range(0, h, rows_per_chunk):
        q0 = body0 + r0 * wp
        chunk = rows_per_chunk * wp
        acc = jnp.zeros((chunk, c), jnp.float32)
        for t, off in enumerate(offs):
            dy_sl = dyp_ref[pl.ds(q0 - off, chunk), :]
            acc = acc + jax.lax.dot(
                dy_sl, wt_ref[t], preferred_element_type=jnp.float32)
        if relu_input:
            # relu'(x) mask from the staged slab: relu(x) > 0 <=> x > 0
            # (f32 compare — bf16 comparisons don't lower on this target).
            mask = xp_ref[pl.ds(q0, chunk), :].astype(jnp.float32) > 0.0
            acc = jnp.where(mask, acc, 0.0)
        acc = acc.reshape(rows_per_chunk, wp, c)
        dx_ref[0, r0:r0 + rows_per_chunk] = (
            acc[:, :w, :].astype(dx_ref.dtype))

    # dW: 9 taps of [Cin, N] @ [N, Cout] over the whole body at once.
    dy_b = dyp_ref[pl.ds(body0, n_body), :]
    for t, off in enumerate(offs):
        x_sl = xp_ref[pl.ds(body0 + off, n_body), :]
        part = jax.lax.dot_general(
            x_sl, dy_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw_ref[t] = dw_ref[t] + part


def _bwd_kernel(x_ref, dy_ref, wt_ref, dx_ref, dw_ref, xp_ref, dyp_ref,
                *, h, w, c, cout, rows_per_chunk, relu_input=False):
    """One grid step = one image; dw accumulates across the grid."""
    b = pl.program_id(0)
    wp, rows, body0 = _geom(h, w)

    # Zero the padded slabs once; later steps only overwrite body columns.
    @pl.when(b == 0)
    def _():
        xp_ref[...] = jnp.zeros_like(xp_ref)
        dyp_ref[...] = jnp.zeros_like(dyp_ref)
        dw_ref[...] = jnp.zeros_like(dw_ref)

    _stage_rows(xp_ref, x_ref, h, w, wp, body0, relu=relu_input)
    _stage_rows(dyp_ref, dy_ref, h, w, wp, body0)
    _conv_bwd_core(xp_ref, dyp_ref, wt_ref, dx_ref, dw_ref,
                   h, w, c, cout, rows_per_chunk, relu_input)


@functools.partial(jax.jit, static_argnames=("interpret", "relu_input"))
def conv3x3_bwd(x, w, dy, interpret=None, relu_input=False):
    """(dx, dw) for y = conv3x3_same(x, w); NHWC x [B,H,W,C], HWIO w.

    ``relu_input=True``: x is PRE-relu; returns the backward of
    y = conv3x3_same(relu(x), w) with the mask fused (see _bwd_kernel)."""
    b, h, wd, c = x.shape
    cout = w.shape[-1]
    wp, rows, _ = _geom(h, wd)
    # W_t^T stacked: [9, Cout, Cin]
    wt = jnp.transpose(w.reshape(9, c, cout), (0, 2, 1)).astype(dy.dtype)

    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, w=wd, c=c, cout=cout,
                          rows_per_chunk=8, relu_input=relu_input),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wd, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, wd, cout), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, cout, c), lambda i: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, wd, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, c, cout), lambda i: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wd, c), x.dtype),
            jax.ShapeDtypeStruct((9, c, cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, c), x.dtype),
            pltpu.VMEM((rows, cout), dy.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret() if interpret is None else interpret,
    )(x, dy, wt)

    return dx, dw.reshape(3, 3, c, cout)


# ---------------------------------------------------------------------------
# custom_vjp wrappers: XLA forward (MXU-optimal), Pallas fused backward.
# ---------------------------------------------------------------------------

@jax.custom_vjp
def conv3x3_same(x, w):
    """3x3 stride-1 SAME conv, NHWC/HWIO — forward on XLA."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _fwd(x, w):
    return conv3x3_same(x, w), (x, w)


def _bwd(res, dy):
    x, w = res
    dx, dw = conv3x3_bwd(x, w, dy)
    return dx, dw.astype(w.dtype)


conv3x3_same.defvjp(_fwd, _bwd)


@jax.custom_vjp
def relu_conv3x3(x, w):
    """conv3x3_same(relu(x), w) with the relu backward mask fused into the
    Pallas dx epilogue (resblock conv2 site: AdaINResBlock's relu->conv2,
    reference model.py:48-51)."""
    return jax.lax.conv_general_dilated(
        jax.nn.relu(x), w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _relu_fwd(x, w):
    return relu_conv3x3(x, w), (x, w)


def _relu_bwd(res, dy):
    x, w = res
    dx, dw = conv3x3_bwd(x, w, dy, relu_input=True)
    return dx, dw.astype(w.dtype)


relu_conv3x3.defvjp(_relu_fwd, _relu_bwd)


# ---------------------------------------------------------------------------
# conv + IN + modulate units (MSIG_CONV_VJP=2): the AdaIN backward runs
# inside the same kernel.
# ---------------------------------------------------------------------------

def _bwd_adain_kernel(x_ref, y_ref, g_ref, wt_ref, mu_ref, r_ref, gm_ref,
                      dx_ref, dw_ref, dg_ref, db_ref, xp_ref, dyp_ref,
                      *, h, w, c, cout, rows_per_chunk, relu_input):
    """Backward of z = gamma*IN(conv3x3([relu](x), w)) + beta, one image
    per grid step (dw accumulates across the grid).

    The AdaIN/IN backward happens IN VMEM, chunk-wise from the input
    blocks (the proven int8-kernel access pattern):
        pass 1: sg = sum(g), sgy = sum(g*yhat) per channel
        pass 2: dy = gamma*r*(g - sg/N - yhat*sgy/N) staged into the
                padded conv slab
    with yhat = (y - mu)*r from stats saved at the forward.
    ``dgamma = sgy``, ``dbeta = sg`` come out for free.
    """
    b = pl.program_id(0)
    wp, rows, body0 = _geom(h, w)
    n = float(h * w)

    @pl.when(b == 0)
    def _():
        xp_ref[...] = jnp.zeros_like(xp_ref)
        dyp_ref[...] = jnp.zeros_like(dyp_ref)
        dw_ref[...] = jnp.zeros_like(dw_ref)

    _stage_rows(xp_ref, x_ref, h, w, wp, body0, relu=relu_input)

    mu = mu_ref[0, 0, :]
    r = r_ref[0, 0, :]
    gamma = gm_ref[0, 0, :]

    # pass 1: per-channel reductions, row-chunk at a time
    sg = jnp.zeros((1, cout), jnp.float32)
    sgy = jnp.zeros((1, cout), jnp.float32)
    for r0 in range(0, h, rows_per_chunk):
        gf = g_ref[0, r0:r0 + rows_per_chunk].astype(jnp.float32).reshape(
            rows_per_chunk * w, cout)
        yh = (y_ref[0, r0:r0 + rows_per_chunk].astype(jnp.float32).reshape(
            rows_per_chunk * w, cout) - mu) * r
        sg = sg + jnp.sum(gf, axis=0, keepdims=True)
        sgy = sgy + jnp.sum(gf * yh, axis=0, keepdims=True)
    dg_ref[0, 0, :] = sgy[0]
    db_ref[0, 0, :] = sg[0]

    # pass 2: dy chunks staged into the padded slab
    gr = gamma * r
    mg = sg / n
    mgy = sgy / n
    for r0 in range(0, h, rows_per_chunk):
        gf = g_ref[0, r0:r0 + rows_per_chunk].astype(jnp.float32).reshape(
            rows_per_chunk * w, cout)
        yh = (y_ref[0, r0:r0 + rows_per_chunk].astype(jnp.float32).reshape(
            rows_per_chunk * w, cout) - mu) * r
        dy = (gr * (gf - mg - yh * mgy)).astype(dyp_ref.dtype).reshape(
            rows_per_chunk, w, cout)
        for rr in range(rows_per_chunk):
            dyp_ref[pl.ds(body0 + (r0 + rr) * wp, w), :] = dy[rr]

    _conv_bwd_core(xp_ref, dyp_ref, wt_ref, dx_ref, dw_ref,
                   h, w, c, cout, rows_per_chunk, relu_input)


@functools.partial(jax.jit, static_argnames=("interpret", "relu_input"))
def conv3x3_adain_bwd(x, w, y, mu, r, gamma, g, interpret=None,
                      relu_input=False):
    """(dx, dw, dgamma, dbeta) for z = gamma*IN(conv3x3([relu](x), w)) + beta.

    ``y`` is the saved conv output; ``mu``/``r`` its per-(B,C) IN mean and
    rsqrt(var+eps); ``g`` the cotangent of z."""
    b, h, wd, c = x.shape
    cout = w.shape[-1]
    wp, rows, _ = _geom(h, wd)
    wt = jnp.transpose(w.reshape(9, c, cout), (0, 2, 1)).astype(x.dtype)
    mu3 = mu.reshape(b, 1, cout).astype(jnp.float32)
    r3 = r.reshape(b, 1, cout).astype(jnp.float32)
    gm3 = gamma.reshape(b, 1, cout).astype(jnp.float32)

    dx, dw, dgm, dbt = pl.pallas_call(
        functools.partial(_bwd_adain_kernel, h=h, w=wd, c=c, cout=cout,
                          rows_per_chunk=8, relu_input=relu_input),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wd, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, wd, cout), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, wd, cout), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, cout, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, wd, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, c, cout), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wd, c), x.dtype),
            jax.ShapeDtypeStruct((9, c, cout), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cout), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, c), x.dtype),
            pltpu.VMEM((rows, cout), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret() if interpret is None else interpret,
    )(x, y, g, wt, mu3, r3, gm3)

    return (dx, dw.reshape(3, 3, c, cout),
            dgm.reshape(b, cout), dbt.reshape(b, cout))


def _adain_unit_fwd_impl(x, w, gamma, beta, relu_input):
    xin = jax.nn.relu(x) if relu_input else x
    y = jax.lax.conv_general_dilated(
        xin, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, axis=(1, 2))                       # [B, C]
    var = jnp.mean(jnp.square(yf - mu[:, None, None, :]), axis=(1, 2))
    r = jax.lax.rsqrt(var + _IN_EPS)
    scale = (gamma.astype(jnp.float32) * r)[:, None, None, :]
    shift = (beta.astype(jnp.float32) - mu * gamma.astype(jnp.float32) * r)[
        :, None, None, :]
    z = (yf * scale + shift).astype(x.dtype)
    return z, (y, mu, r)


def _make_adain_unit(relu_input):
    @jax.custom_vjp
    def unit(x, w, gamma, beta):
        z, _ = _adain_unit_fwd_impl(x, w, gamma, beta, relu_input)
        return z

    def fwd(x, w, gamma, beta):
        z, (y, mu, r) = _adain_unit_fwd_impl(x, w, gamma, beta, relu_input)
        return z, (x, w, y, mu, r, gamma)

    def bwd(res, g):
        x, w, y, mu, r, gamma = res
        dx, dw, dgm, dbt = conv3x3_adain_bwd(
            x, w, y, mu, r, gamma, g, relu_input=relu_input)
        return dx, dw.astype(w.dtype), dgm.astype(gamma.dtype), dbt.astype(
            gamma.dtype)

    unit.defvjp(fwd, bwd)
    return unit


# z = gamma * IN(conv3x3(x, w)) + beta, Pallas fused backward.
conv3x3_adain = _make_adain_unit(relu_input=False)
# z = gamma * IN(conv3x3(relu(x), w)) + beta (resblock conv2 site).
relu_conv3x3_adain = _make_adain_unit(relu_input=True)


def supported(x_shape, kernel_shape, strides, padding, pad_mode) -> bool:
    """True when (shape, stride, padding) is in this kernel's domain:
    3x3, stride 1, symmetric zero SAME padding, lane-aligned channels, a
    square map whose padded slabs fit the VMEM budget (the trunk's 64x64
    and the 512^2 config's 128x128)."""
    kh, kw, cin, cout = kernel_shape
    if (kh, kw) != (3, 3) or strides != 1:
        return False
    if pad_mode != "zeros" or padding != ((1, 1), (1, 1)):
        return False
    if cin % 128 or cout % 128:
        return False
    b, h, w, c = x_shape
    if c != cin or h != w or h % 8:
        return False
    wp, rows, _ = _geom(h, w)
    slab_bytes = rows * (cin + cout) * 2
    return slab_bytes < 24 * 1024 * 1024
