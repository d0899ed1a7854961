"""Fused int8 3x3 convolution + IN/AdaIN epilogue as a single Pallas kernel.

Round-1 analysis (docs/PERF.md) showed that on this toolchain any
epilogue-only Pallas kernel loses to XLA because the ``pallas_call``
boundary forces the int32 conv output through HBM, while XLA fuses the
requant/IN chain straight into the convolution output. The conclusion was
that a Pallas win requires the CONVOLUTION ITSELF inside the kernel — this
module is that kernel.

Design (TPU-first, no reference analogue — the reference delegates to cuDNN
eager ops, /root/reference/model.py:38-55):

  * Layout: the 64x64x256 resblock feature map is stored flattened as
    ``[4096 pixel-rows, 256 lanes]`` int8 with 128 zero guard rows on each
    side (``XROWS = 4352``). A 3x3/pad-1 convolution then becomes, for each
    tap ``(dy, dx)``, a plain row-shifted matmul: output row ``r`` reads
    input row ``r + (dy-1)*64 + (dx-1)``. Horizontal edge taps are zeroed
    with a static ``j = r mod 64`` mask (exactly reproducing zero padding);
    vertical edge taps read the zero guard rows.
  * The 9 taps are concatenated along K into one ``[CHUNK, 2304]`` int8
    operand and hit the MXU as a single dense int8 matmul per chunk
    (K = 2304 = 18 MXU tiles) accumulating in int32 — no partial-sum
    traffic, no im2col in HBM.
  * The epilogue (instance-norm statistics, AdaIN modulation, ReLU, exact
    per-sample amax, requantization to int8) runs on the VMEM-resident
    int32 slab inside the same program. The exact amax of
    ``relu(a*x + d)`` is derived from the per-channel min/max of the raw
    conv output (monotone per-channel affine), so no extra pass over the
    modulated tensor is needed.
  * Grid = (batch,): one program per sample; Mosaic double-buffers the
    1 MB int8 input/output blocks across programs. HBM traffic per conv
    site is one int8 read + one int8 write (~2.2 MB) versus the measured
    ~11 MB of the XLA-lowered epilogue chain.

Numerics match ``_requant(relu(adain_modulate(conv(x))))`` from
msig_tpu/infer/quantized.py to +-1 int8 step (tests/test_fused_conv_int8.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Spatial geometry for the 256x256-input generator trunk: feature maps are
# 64x64, flattened to 4096 rows with 128-row zero guards on both sides.
W_IMG = 64
SROWS = W_IMG * W_IMG          # 4096
GUARD = 128                    # >= 65 = max |tap row offset|, kept tile-aligned
XROWS = SROWS + 2 * GUARD      # 4352
CHUNK = 1024                   # matmul M per chunk; multiple of W_IMG
N_CHUNKS = SROWS // CHUNK      # 8
_EPS = 1e-5


def supported(c: int) -> bool:
    """Kernel supports channel counts that are lane multiples (trunk: 256)."""
    return c % 128 == 0 and jax.default_backend() in ("tpu", "axon", "cpu")


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def pack_weights(w_hwio: jax.Array) -> jax.Array:
    """[3,3,C,C] conv kernel -> [9C, C] K-concatenated int8 matmul operand."""
    kh, kw, ci, co = w_hwio.shape
    assert (kh, kw) == (3, 3)
    return jnp.asarray(w_hwio, jnp.int8).reshape(9 * ci, co)


def pad_to_rows(x_flat_i8: jax.Array) -> jax.Array:
    """[B, 4096, C] int8 -> [B, XROWS, C] with zero guard rows."""
    return jnp.pad(x_flat_i8, ((0, 0), (GUARD, GUARD), (0, 0)))


def pad_rows(x_flat_i8: jax.Array, guard: int) -> jax.Array:
    """[B, S, C] int8 -> [B, S + 2*guard, C] with zero guard rows."""
    return jnp.pad(x_flat_i8, ((0, 0), (guard, guard), (0, 0)))


def _tap_offsets():
    offs = []
    for dy in range(3):
        for dx in range(3):
            offs.append((dy - 1) * W_IMG + (dx - 1))
    return offs


_OFFS = _tap_offsets()


def _build_lhs(x_ref, lhs, c, cin):
    """Fill the [CHUNK, 9*cin] int8 concat operand for output chunk ``c``."""
    # j = column index of each output row within its image row; CHUNK is a
    # multiple of W_IMG so the pattern is chunk-invariant.
    j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) % W_IMG
    left_edge = j == 0           # tap dx=0 reads pixel (i, j-1): invalid at j=0
    right_edge = j == W_IMG - 1  # tap dx=2 reads pixel (i, j+1): invalid at j=63
    for t, off in enumerate(_OFFS):
        start = GUARD + c * CHUNK + off
        window = x_ref[0, pl.ds(start, CHUNK), :]
        dx = t % 3
        if dx == 0:
            window = jnp.where(left_edge, jnp.int8(0), window)
        elif dx == 2:
            window = jnp.where(right_edge, jnp.int8(0), window)
        lhs[:, t * cin:(t + 1) * cin] = window


def _kernel(eps, cin, x_ref, w_ref, g_ref, b_ref, o_ref, lhs, acc):
    """conv3x3(int8) -> AdaIN -> ReLU -> requant(int8), one sample.

    The epilogue is chunked (the loops are unrolled at trace time) so that
    fp32 temporaries stay at CHUNK x C — a whole-slab fp32 view would blow
    the 16 MB scoped-VMEM stack.
    """
    n = float(SROWS)
    sums = jnp.zeros((1, cin), jnp.float32)
    sumsq = jnp.zeros((1, cin), jnp.float32)
    cmin = jnp.full((1, cin), jnp.inf, jnp.float32)
    cmax = jnp.full((1, cin), -jnp.inf, jnp.float32)
    for c in range(N_CHUNKS):
        _build_lhs(x_ref, lhs, c, cin)
        yc = jax.lax.dot_general(
            lhs[:, :], w_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc[pl.ds(c * CHUNK, CHUNK), :] = yc
        xf = yc.astype(jnp.float32)
        sums = sums + jnp.sum(xf, axis=0, keepdims=True)
        sumsq = sumsq + jnp.sum(xf * xf, axis=0, keepdims=True)
        cmin = jnp.minimum(cmin, jnp.min(xf, axis=0, keepdims=True))
        cmax = jnp.maximum(cmax, jnp.max(xf, axis=0, keepdims=True))

    mean = sums / n
    var = jnp.maximum(sumsq / n - mean * mean, 0.0)
    g = g_ref[0, :, :].astype(jnp.float32)
    b = b_ref[0, :, :].astype(jnp.float32)
    a = g * jax.lax.rsqrt(var + eps)
    d = b - mean * a
    # exact spatial max of relu(a*x + d) from the raw per-channel extremes
    hi = jnp.maximum(a * cmax, a * cmin) + d
    amax = jnp.max(jnp.maximum(hi, 0.0))
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)

    for c in range(N_CHUNKS):
        xf = acc[pl.ds(c * CHUNK, CHUNK), :].astype(jnp.float32)
        y = jnp.maximum(xf * a + d, 0.0) * s
        o_ref[0, pl.ds(GUARD + c * CHUNK, CHUNK), :] = jnp.clip(
            jnp.round(y), -127.0, 127.0
        ).astype(jnp.int8)
    o_ref[0, pl.ds(0, GUARD), :] = jnp.zeros((GUARD, cin), jnp.int8)
    o_ref[0, pl.ds(GUARD + SROWS, GUARD), :] = jnp.zeros((GUARD, cin), jnp.int8)


def pack_convt_weights(w_hwio: jax.Array, cin: int, cout: int) -> jax.Array:
    """ConvTranspose2d(4, stride 2, pad 1) kernel -> [9*cin, 4*cout] int8.

    The transposed conv (lowered in XLA as an lhs-dilated conv, see
    msig_tpu/infer/quantized.py::_conv_i8) decomposes into 4 output phases
    (qy, qx), each a conv over input taps dy, dx in {-1,0,1}:

        out(2I+qy, 2J+qx) = sum_{dy,dx} x(I+dy, J+dx) * w[2dy+2-qy, 2dx+2-qx]

    (taps with 2dy+2-qy outside [0,4) are zero). Packing all 4 phases along
    N gives ONE [9*cin, 4*cout] matmul operand; the kernel output is then
    the space-to-depth (s2d) layout of the upsampled map, which the caller
    un-phases with a cheap XLA transpose.
    """
    assert w_hwio.shape == (4, 4, cin, cout)
    w = np.asarray(w_hwio)
    packed = np.zeros((9 * cin, 4 * cout), np.int8)
    taps = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    for t, (dy, dx) in enumerate(taps):
        for qy in (0, 1):
            u = 2 * dy + 2 - qy
            if not 0 <= u < 4:
                continue
            for qx in (0, 1):
                v = 2 * dx + 2 - qx
                if not 0 <= v < 4:
                    continue
                packed[t * cin:(t + 1) * cin,
                       (qy * 2 + qx) * cout:(qy * 2 + qx + 1) * cout] = w[u, v]
    return jnp.asarray(packed)


def _build_lhs_g(x_ref, lhs, c, cin, w_img, chunk, guard):
    """Generalized 9-tap K-concat lhs builder (any row width / channels)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) % w_img
    left_edge = j == 0
    right_edge = j == w_img - 1
    offs = [dy * w_img + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    for t, off in enumerate(offs):
        start = guard + c * chunk + off
        window = x_ref[0, pl.ds(start, chunk), :]
        dx = t % 3
        if dx == 0:
            window = jnp.where(left_edge, jnp.int8(0), window)
        elif dx == 2:
            window = jnp.where(right_edge, jnp.int8(0), window)
        lhs[:, t * cin:(t + 1) * cin] = window


def _kernel_up(eps, cin, cout4, w_img, guard, srows, chunk,
               x_ref, w_ref, o_ref, os_ref, lhs, acc):
    """Fused upsampling site: ConvT4x4s2 (as 9-tap phase matmul) -> IN ->
    ReLU -> requant, one sample. Output in s2d layout [srows, 4*cout].

    Instance-norm statistics are per ORIGINAL channel: the 4 phase blocks of
    the s2d layout are folded together before mean/var, exactly reproducing
    stats over the full upsampled spatial extent.
    """
    n_chunks = srows // chunk
    cout = cout4 // 4
    n = float(srows * 4)  # spatial size of the upsampled map per channel
    sums = jnp.zeros((1, cout4), jnp.float32)
    sumsq = jnp.zeros((1, cout4), jnp.float32)
    cmin = jnp.full((1, cout4), jnp.inf, jnp.float32)
    cmax = jnp.full((1, cout4), -jnp.inf, jnp.float32)
    for c in range(n_chunks):
        _build_lhs_g(x_ref, lhs, c, cin, w_img, chunk, guard)
        yc = jax.lax.dot_general(
            lhs[:, :], w_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc[pl.ds(c * chunk, chunk), :] = yc
        xf = yc.astype(jnp.float32)
        sums = sums + jnp.sum(xf, axis=0, keepdims=True)
        sumsq = sumsq + jnp.sum(xf * xf, axis=0, keepdims=True)
        cmin = jnp.minimum(cmin, jnp.min(xf, axis=0, keepdims=True))
        cmax = jnp.maximum(cmax, jnp.max(xf, axis=0, keepdims=True))

    # fold the 4 phase blocks into per-channel statistics (explicit lane
    # slices — Mosaic cannot lower a lane-splitting reshape)
    def _fold(v):
        return (v[:, 0 * cout:1 * cout] + v[:, 1 * cout:2 * cout]
                + v[:, 2 * cout:3 * cout] + v[:, 3 * cout:4 * cout])

    mean_c = _fold(sums) / n
    sq_c = _fold(sumsq) / n
    var_c = jnp.maximum(sq_c - mean_c * mean_c, 0.0)
    a_c = jax.lax.rsqrt(var_c + eps)        # IN without affine: gamma=1
    d_c = -mean_c * a_c
    a = jnp.concatenate([a_c, a_c, a_c, a_c], axis=1)
    d = jnp.concatenate([d_c, d_c, d_c, d_c], axis=1)
    hi = jnp.maximum(a * cmax, a * cmin) + d
    amax = jnp.max(jnp.maximum(hi, 0.0))
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    os_ref[0, 0, 0] = jnp.where(amax > 0, amax / 127.0, 1.0)

    for c in range(n_chunks):
        xf = acc[pl.ds(c * chunk, chunk), :].astype(jnp.float32)
        y = jnp.maximum(xf * a + d, 0.0) * s
        o_ref[0, pl.ds(c * chunk, chunk), :] = jnp.clip(
            jnp.round(y), -127.0, 127.0
        ).astype(jnp.int8)


def convt4x4s2_in_relu_requant(
    x_q: jax.Array, w_packed: jax.Array, w_img: int, guard: int,
    eps: float = _EPS, chunk: int = 1024,
):
    """Fused decoder upsampling site (dec_up0 / dec_up1 of the generator).

    Args:
      x_q: [B, srows + 2*guard, C_in] int8, guard-padded flattened rows of a
        (w_img x w_img) feature map; guards must be zero and >= w_img + 1.
      w_packed: [9*C_in, 4*C_out] int8 from :func:`pack_convt_weights`.
      w_img: input spatial width (64 for dec_up0, 128 for dec_up1 at 256^2).

    Returns:
      (y_q [B, srows, 4*C_out] int8 in s2d layout, inv_scale [B, 1, 1] f32).
    """
    bsz, xrows, cin = x_q.shape
    srows = w_img * w_img
    assert xrows == srows + 2 * guard, (xrows, srows, guard)
    cout4 = w_packed.shape[1]
    assert w_packed.shape[0] == 9 * cin
    kernel = functools.partial(
        _kernel_up, eps, cin, cout4, w_img, guard, srows, chunk)
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
        scratch_shapes=[
            pltpu.VMEM((chunk, 9 * cin), jnp.int8),
            pltpu.VMEM((srows, cout4), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x_q, w_packed)


def _kernel_res(eps, cin, x_ref, h_ref, hs_ref, w_ref, g_ref, b_ref,
                o_ref, os_ref, lhs, acc):
    """conv3x3(int8) -> AdaIN -> +residual -> requant(int8), one sample.

    The residual chain is carried quantized: ``h = h_ref * hs_ref`` with a
    per-sample scalar scale. Output is the requantized new residual state
    plus its scale (``os_ref``), so consecutive resblocks chain kernel to
    kernel with nothing but int8 in HBM.
    """
    n = float(SROWS)
    sums = jnp.zeros((1, cin), jnp.float32)
    sumsq = jnp.zeros((1, cin), jnp.float32)
    for c in range(N_CHUNKS):
        _build_lhs(x_ref, lhs, c, cin)
        yc = jax.lax.dot_general(
            lhs[:, :], w_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc[pl.ds(c * CHUNK, CHUNK), :] = yc
        xf = yc.astype(jnp.float32)
        sums = sums + jnp.sum(xf, axis=0, keepdims=True)
        sumsq = sumsq + jnp.sum(xf * xf, axis=0, keepdims=True)

    mean = sums / n
    var = jnp.maximum(sumsq / n - mean * mean, 0.0)
    g = g_ref[0, :, :].astype(jnp.float32)
    b = b_ref[0, :, :].astype(jnp.float32)
    a = g * jax.lax.rsqrt(var + eps)
    d = b - mean * a
    hs = hs_ref[0, 0, 0]

    # pass 1 over VMEM: exact amax of h_new = adain(y) + h  (no relu here)
    amax = jnp.float32(0.0)
    for c in range(N_CHUNKS):
        xf = acc[pl.ds(c * CHUNK, CHUNK), :].astype(jnp.float32)
        hf = h_ref[0, pl.ds(GUARD + c * CHUNK, CHUNK), :].astype(jnp.float32) * hs
        hn = xf * a + d + hf
        amax = jnp.maximum(amax, jnp.max(jnp.abs(hn)))
    s = jnp.where(amax > 0, 127.0 / amax, 1.0)
    os_ref[0, 0, 0] = jnp.where(amax > 0, amax / 127.0, 1.0)

    # pass 2: recompute and write the quantized new residual state
    for c in range(N_CHUNKS):
        xf = acc[pl.ds(c * CHUNK, CHUNK), :].astype(jnp.float32)
        hf = h_ref[0, pl.ds(GUARD + c * CHUNK, CHUNK), :].astype(jnp.float32) * hs
        hn = (xf * a + d + hf) * s
        o_ref[0, pl.ds(GUARD + c * CHUNK, CHUNK), :] = jnp.clip(
            jnp.round(hn), -127.0, 127.0
        ).astype(jnp.int8)
    o_ref[0, pl.ds(0, GUARD), :] = jnp.zeros((GUARD, cin), jnp.int8)
    o_ref[0, pl.ds(GUARD + SROWS, GUARD), :] = jnp.zeros((GUARD, cin), jnp.int8)


def conv3x3_adain_residual_requant(
    y1_q: jax.Array, h_q: jax.Array, h_scale: jax.Array,
    w_packed: jax.Array, gamma: jax.Array, beta: jax.Array,
    eps: float = _EPS,
):
    """Fused resblock conv2 site with quantized residual carry.

    Args:
      y1_q: [B, XROWS, C] int8 output of :func:`conv3x3_adain_relu_requant`.
      h_q: [B, XROWS, C] int8 quantized residual state.
      h_scale: [B, 1] float32 dequant scale of ``h_q``.
      w_packed: [9C, C] int8.
      gamma, beta: [B, C] float32.

    Returns:
      (h_q_new [B, XROWS, C] int8, h_scale_new [B, 1] float32).
    """
    bsz, xrows, cin = y1_q.shape
    assert xrows == XROWS and w_packed.shape == (9 * cin, cin)
    kernel = functools.partial(_kernel_res, eps, cin)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, XROWS, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, XROWS, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((9 * cin, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, XROWS, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, XROWS, cin), jnp.int8),
            jax.ShapeDtypeStruct((bsz, 1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((CHUNK, 9 * cin), jnp.int8),   # K-concat lhs
            pltpu.VMEM((SROWS, cin), jnp.int32),      # conv accumulator slab
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(y1_q, h_q, h_scale.reshape(bsz, 1, 1), w_packed,
      gamma[:, None, :], beta[:, None, :])


def conv3x3_adain_relu_requant(
    x_q: jax.Array, w_packed: jax.Array, gamma: jax.Array, beta: jax.Array,
    eps: float = _EPS,
) -> jax.Array:
    """Fused resblock conv1 site.

    Args:
      x_q: [B, XROWS, C] int8, guard-padded flattened 64x64 features.
      w_packed: [9C, C] int8 from :func:`pack_weights`.
      gamma, beta: [B, C] float32 AdaIN modulation.

    Returns:
      [B, XROWS, C] int8: requantized relu(adain(conv(x))), guards zeroed.
    """
    bsz, xrows, cin = x_q.shape
    assert xrows == XROWS and w_packed.shape == (9 * cin, cin)
    kernel = functools.partial(_kernel, eps, cin)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, XROWS, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, XROWS, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, XROWS, cin), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, 9 * cin), jnp.int8),   # K-concat lhs
            pltpu.VMEM((SROWS, cin), jnp.int32),        # conv accumulator slab
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x_q, w_packed, gamma[:, None, :], beta[:, None, :])
