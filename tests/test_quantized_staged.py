"""Per-stage Pallas/XLA composition of the int8 generator.

`quantized_generator_apply_staged` exists to attribute the all-Pallas vs
int8-XLA PSNR difference to a single stage (VERDICT r3 directive #3;
tools/check_psnr_tpu.py reports the table on real TPU). These tests pin
the composition logic on CPU:

- with no Pallas stages it must be BIT-IDENTICAL to the refactored XLA
  path (the refactor into _xla_encoder/_xla_trunk/_xla_decoder must not
  change the production path);
- with all stages it must be bit-identical to the all-Pallas path
  (interpret mode);
- each single-stage swap must produce an output close to the XLA path
  (the adapters between spatial and padded-row layouts are the risky
  part — a wrong guard offset or scale would show up as garbage, not a
  fraction of a dB).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msig_tpu.infer.quantized import (
    quantize_generator_params,
    quantized_generator_apply,
    quantized_generator_apply_staged,
)
from msig_tpu.models import StyleCycleGANGenerator
from msig_tpu.train.step import prepare_images

N_RES = 2


def _setup(image_size, batch=1):
    gen = StyleCycleGANGenerator(style_dim=64, n_residual_blocks=N_RES,
                                 dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, image_size, image_size, 3), jnp.bfloat16)
    params = gen.init(jax.random.PRNGKey(0), img0,
                      jnp.zeros((1, 64), jnp.bfloat16))
    q = quantize_generator_params(params, N_RES)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (batch, image_size, image_size, 3),
                                   dtype=np.uint8))
    style = jnp.asarray(rng.normal(0, 1, (batch, 64)).astype(np.float32))
    return gen, params, q, img, style


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32) - np.asarray(b, np.float32)) ** 2))
    return 10 * np.log10(4.0 / mse) if mse else np.inf


def test_staged_no_pallas_bit_identical_to_xla_path():
    _, _, q, img, style = _setup(64, batch=2)
    ref = quantized_generator_apply(q, img, style, n_res=N_RES,
                                    fused_trunk=False)
    got = quantized_generator_apply_staged(q, img, style, n_res=N_RES,
                                           pallas=())
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.slow
def test_staged_all_pallas_bit_identical_to_fused_path():
    _, _, q, img, style = _setup(256)
    ref = quantized_generator_apply(q, img, style, n_res=N_RES,
                                    fused_trunk=True)
    got = quantized_generator_apply_staged(
        q, img, style, n_res=N_RES, pallas=("enc", "trunk", "dec"))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.slow
@pytest.mark.parametrize("pallas", [("enc",), ("trunk",), ("dec",),
                                    ("enc", "trunk"), ("trunk", "dec")])
def test_staged_hybrids_close_to_xla_path(pallas):
    gen, params, q, img, style = _setup(256)
    xla = quantized_generator_apply(q, img, style, n_res=N_RES,
                                    fused_trunk=False)
    got = quantized_generator_apply_staged(q, img, style, n_res=N_RES,
                                           pallas=pallas)
    assert np.isfinite(np.asarray(got, np.float32)).all()
    # The stages compute the same math in different layouts/reduction
    # orders; any layout/scale bug in the adapters destroys the image
    # (PSNR < 10), while genuine per-stage quantization deltas are tiny.
    p = _psnr(xla, got)
    assert p > 25, f"hybrid {pallas}: PSNR vs XLA path {p:.1f} dB"
