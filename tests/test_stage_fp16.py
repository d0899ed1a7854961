"""fp16-staged HBM accumulators (MSIG_STAGE_FP16=1, VERDICT r4 #3).

The strict staging tests (tests/test_fused_dec_512.py etc.) run with the
default int32 staging, where the HBM round trip is bit-preserving. fp16
staging halves the round-trip traffic at the cost of ~2^-11-relative noise
on the requant input — stats/scales stay EXACT (computed pre-drain), and
int8 codes may flip by at most 1 on the few % of elements whose pre-round
position sits within the noise of a rounding boundary. These tests pin
that contract at the 64-grid (quick); the 512^2 e2e PSNR gate runs on
chip via tools/check_psnr_tpu.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from msig_tpu.ops import fused_conv_int8_v2 as f2
from msig_tpu.ops import fused_dec_int8 as fd


@pytest.mark.heavy
def test_up1_hbm_fp16_staging_contract(monkeypatch):
    rng = np.random.default_rng(0)
    w_up0 = jnp.asarray(rng.integers(-127, 128, (4, 4, 256, 128),
                                     dtype=np.int8))
    w_up1 = rng.integers(-127, 128, (4, 4, 128, 64), dtype=np.int8)
    hq = f2.to_padded_rows(jnp.asarray(
        rng.integers(-127, 128, (2, 64, 64, 256), dtype=np.int8)))
    up0_ps, _ = f2.pack_convt_weights_ps(w_up0, 256, 128)
    y0g, _ = f2.convt4x4s2_in_relu_requant_ps(
        hq, up0_ps, f2.PS_TAPS, 64, guarded_out=True)
    wpk = fd.pack_up1_s2d16(w_up1)

    monkeypatch.setenv("MSIG_STAGE_FP16", "0")
    y_ref, s_ref = fd.up1_s2d16_hbm(y0g, wpk, w_cells=64)
    monkeypatch.setenv("MSIG_STAGE_FP16", "1")
    y_fp, s_fp = fd.up1_s2d16_hbm(y0g, wpk, w_cells=64)

    # scales derive from the pre-drain int32 stats: EXACT match
    np.testing.assert_allclose(np.asarray(s_fp).ravel(),
                               np.asarray(s_ref).ravel(), rtol=1e-6)
    diff = np.abs(np.asarray(y_ref, np.int32) - np.asarray(y_fp, np.int32))
    assert diff.max() <= 1, f"max int8 step diff {diff.max()}"
    assert (diff > 0).mean() < 0.10, f"flip rate {(diff > 0).mean():.3f}"
