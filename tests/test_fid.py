"""FID machinery tests: Fréchet math, statistics, directory-level proxy FID."""

import numpy as np
import pytest
from PIL import Image

from msig_tpu.eval import (
    activation_statistics,
    compute_fid,
    fid_between_dirs,
    frechet_distance,
)


class TestFrechet:
    def test_identical_distributions_zero(self):
        mu = np.array([1.0, 2.0])
        sigma = np.array([[2.0, 0.3], [0.3, 1.0]])
        assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6

    def test_mean_shift_only(self):
        mu1, mu2 = np.zeros(3), np.ones(3)
        sigma = np.eye(3)
        np.testing.assert_allclose(frechet_distance(mu1, sigma, mu2, sigma), 3.0, atol=1e-6)

    def test_known_gaussian_distance(self):
        # 1-D Gaussians: d^2 = (m1-m2)^2 + (s1-s2)^2
        d = frechet_distance(
            np.array([0.0]), np.array([[4.0]]), np.array([3.0]), np.array([[1.0]])
        )
        np.testing.assert_allclose(d, 9.0 + (2.0 - 1.0) ** 2, atol=1e-6)

    def test_statistics(self):
        x = np.random.default_rng(0).standard_normal((500, 4))
        mu, sigma = activation_statistics(x)
        assert mu.shape == (4,) and sigma.shape == (4, 4)
        np.testing.assert_allclose(mu, x.mean(0))


class TestComputeFid:
    def test_same_stream_near_zero(self):
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, (16, 32, 32, 3), dtype=np.uint8)
        fn = lambda b: b.reshape(len(b), -1)[:, :8].astype(np.float64)
        fid = compute_fid(iter([imgs]), iter([imgs.copy()]), fn)
        assert abs(fid) < 1e-4

    def test_different_streams_positive(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 100, (16, 8, 8, 3), dtype=np.uint8)
        b = rng.integers(150, 255, (16, 8, 8, 3), dtype=np.uint8)
        fn = lambda x: x.reshape(len(x), -1)[:, :8].astype(np.float64)
        assert compute_fid(iter([a]), iter([b]), fn) > 10


class TestDirectoryFid:
    def test_proxy_fid_dirs(self, tmp_path):
        rng = np.random.default_rng(0)
        for d, lo, hi in (("a", 0, 128), ("b", 127, 255)):
            (tmp_path / d).mkdir()
            for i in range(6):
                Image.fromarray(
                    rng.integers(lo, hi, (40, 40, 3), dtype=np.uint8)
                ).save(tmp_path / d / f"{i}.png")
        same = fid_between_dirs(str(tmp_path / "a"), str(tmp_path / "a"), image_size=32)
        diff = fid_between_dirs(str(tmp_path / "a"), str(tmp_path / "b"), image_size=32)
        assert abs(same) < 1e-3
        assert diff > same + 0.01
