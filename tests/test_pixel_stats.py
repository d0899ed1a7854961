"""Weights-free quality metrics (msig_tpu/eval/pixel_stats.py).

These back the second metric column of docs/quality/quality.json: they
must (a) be ~0 for identical sets, (b) rank a near-palette set closer
than a far-palette set, (c) stay within their documented ranges.
"""

import numpy as np
import pytest

from msig_tpu.eval.pixel_stats import (
    color_frechet,
    color_texture_descriptor,
    hist_tv,
    pixel_metrics_between_dirs,
)


def _set(rng, base, n=8, size=32, jitter=12):
    out = []
    for _ in range(n):
        img = np.clip(base + rng.normal(0, jitter, (size, size, 3)), 0, 255)
        out.append(img.astype(np.uint8))
    return out


def test_descriptor_shape_and_float_convention():
    rng = np.random.default_rng(0)
    img_u8 = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    d = color_texture_descriptor(img_u8)
    assert d.shape == (12,) and np.isfinite(d).all()
    # [-1,1] float input follows the pipeline convention
    img_f = img_u8.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(color_texture_descriptor(img_f), d, atol=1e-5)


def test_identical_sets_score_zero():
    rng = np.random.default_rng(1)
    a = _set(rng, np.array([120, 80, 60]))
    assert hist_tv(a, a) == 0.0
    assert color_frechet(a, a) < 1e-8


def test_ranks_near_palette_closer_than_far():
    rng = np.random.default_rng(2)
    green = _set(rng, np.array([60, 160, 60]))
    green2 = _set(rng, np.array([70, 150, 65]))
    brown = _set(rng, np.array([150, 90, 40]))
    assert color_frechet(green, green2) < color_frechet(green, brown)
    tv_near = hist_tv(green, green2)
    tv_far = hist_tv(green, brown)
    assert 0.0 <= tv_near <= tv_far <= 1.0


def test_hist_tv_disjoint_palettes_is_one():
    black = [np.zeros((8, 8, 3), np.uint8)] * 4
    white = [np.full((8, 8, 3), 255, np.uint8)] * 4
    assert hist_tv(black, white) == pytest.approx(1.0)


def test_between_dirs(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    da, db = tmp_path / "a", tmp_path / "b"
    da.mkdir(), db.mkdir()
    for i, img in enumerate(_set(rng, np.array([60, 160, 60]), size=64)):
        Image.fromarray(img).save(da / f"{i}.png")
    for i, img in enumerate(_set(rng, np.array([150, 90, 40]), size=64)):
        Image.fromarray(img).save(db / f"{i}.png")
    cf, tv = pixel_metrics_between_dirs(str(da), str(db), image_size=64)
    assert cf > 0 and 0 < tv <= 1.0
