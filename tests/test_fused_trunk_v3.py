"""Parity of the v3 multi-block trunk kernel vs the v2 per-site chain.

The v3 kernel (ops/fused_trunk_v3.py) must be numerically IDENTICAL to
chaining ops/fused_conv_int8_v2.py's conv1/conv2 site kernels — same
layout, same fp32 statistics, same exact amax requant — for any block
count. Runs in Pallas interpret mode on CPU (tests/conftest.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msig_tpu.ops import fused_conv_int8 as fc
from msig_tpu.ops import fused_conv_int8_v2 as f2
from msig_tpu.ops import fused_trunk_v3 as f3

W_IMG = 16  # tiny map: srows = 16*24 = 384, chunk_rows=4 -> 4 chunks
CIN = 8
B = 2


def _mk_inputs(n_blocks, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(-127, 128, (B, W_IMG, W_IMG, CIN), dtype=np.int8)
    xq = f2.to_padded_rows(jnp.asarray(x))
    hs = jnp.asarray(rng.uniform(0.5, 2.0, (B, 1)).astype(np.float32))
    ws, gs, bs = [], [], []
    for _ in range(2 * n_blocks):
        w = rng.integers(-127, 128, (3, 3, CIN, CIN), dtype=np.int8)
        ws.append(fc.pack_weights(jnp.asarray(w)))
        gs.append(rng.uniform(0.5, 1.5, (B, CIN)).astype(np.float32))
        bs.append(rng.uniform(-0.5, 0.5, (B, CIN)).astype(np.float32))
    return xq, hs, ws, gs, bs


def _chain_v2(xq, hs, ws, gs, bs, n_blocks):
    h, s = xq, hs
    for i in range(n_blocks):
        y1 = f2.conv3x3_adain_relu_requant(
            h, ws[2 * i], jnp.asarray(gs[2 * i]), jnp.asarray(bs[2 * i]),
            w_img=W_IMG, chunk_rows=4)
        h, s = f2.conv3x3_adain_residual_requant(
            y1, h, s, ws[2 * i + 1], jnp.asarray(gs[2 * i + 1]),
            jnp.asarray(bs[2 * i + 1]), w_img=W_IMG, chunk_rows=4)
    return h, s


@pytest.mark.parametrize("n_blocks", [1, 3])
@pytest.mark.heavy
def test_v3_matches_v2_chain(n_blocks):
    xq, hs, ws, gs, bs = _mk_inputs(n_blocks)
    want, want_s = _chain_v2(xq, hs, ws, gs, bs, n_blocks)
    w_stack = jnp.concatenate(ws, axis=0)
    gammas = jnp.stack(gs, axis=1)
    betas = jnp.stack(bs, axis=1)
    got, got_s = f3.fused_trunk_blocks(
        xq, hs, w_stack, gammas, betas, n_blocks, w_img=W_IMG, chunk_rows=4)
    np.testing.assert_allclose(np.asarray(got_s).reshape(-1),
                               np.asarray(want_s).reshape(-1), rtol=1e-6, atol=0)
    # int8 slabs: identical up to +-1 from fp32 op-ordering in the stats
    diff = np.abs(np.asarray(got).astype(np.int32)
                  - np.asarray(want).astype(np.int32))
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 1e-3


def test_v3_single_block_guards_zero():
    xq, hs, ws, gs, bs = _mk_inputs(1, seed=3)
    w_stack = jnp.concatenate(ws, axis=0)
    got, _ = f3.fused_trunk_blocks(
        xq, hs, w_stack, jnp.stack(gs, 1), jnp.stack(bs, 1), 1,
        w_img=W_IMG, chunk_rows=4)
    g = f2.guard_rows(W_IMG)
    out = np.asarray(got)
    assert (out[:, :g] == 0).all() and (out[:, -g:] == 0).all()
    # guard columns inside the body rows are zero too
    wp = W_IMG + 8
    body = out[:, g:g + W_IMG * wp].reshape(B, W_IMG, wp, CIN)
    assert (body[:, :, W_IMG:] == 0).all()
