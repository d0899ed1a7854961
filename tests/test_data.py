"""Data-layer tests: discovery parity, sampling semantics, crop params, loader."""

import os

import numpy as np
import pytest
from PIL import Image

from msig_tpu.data import (
    MultiDomainDataset,
    TrainLoader,
    discover_inference_domains,
    list_image_files,
    load_inference_image,
    load_train_image,
    random_resized_crop_params,
)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """Tiny synthetic data tree: 5 source images, 3 target domains (2/3/4)."""
    root = tmp_path_factory.mktemp("data")
    src = root / "src" / "Healthy"
    src.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)).save(
            src / f"img_{i}.jpg"
        )
    ref = root / "ref"
    for d, n in [("DomainB", 2), ("DomainA", 3), ("DomainC", 4)]:
        (ref / d).mkdir(parents=True)
        for i in range(n):
            Image.fromarray(rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)).save(
                ref / d / f"r{i}.png"
            )
    (ref / "EmptyDomain").mkdir()  # no images -> must be skipped
    return str(src), str(ref)


class TestDiscovery:
    def test_sorted_domains_source_is_zero(self, tree):
        src, ref = tree
        ds = MultiDomainDataset.build(src, ref)
        assert ds.domains == ["source", "DomainA", "DomainB", "DomainC"]
        assert ds.domain_to_idx == {"source": 0, "DomainA": 1, "DomainB": 2, "DomainC": 3}
        assert ds.num_domains == 4
        assert ds.num_target_domains == 3

    def test_empty_domain_skipped_and_len_semantics(self, tree):
        src, ref = tree
        ds = MultiDomainDataset.build(src, ref)
        assert "EmptyDomain" not in ds.domains
        # len = max(len(src)=5, max target count=4) = 5
        assert len(ds) == 5

    def test_raises_without_targets(self, tree, tmp_path):
        src, _ = tree
        with pytest.raises(ValueError):
            MultiDomainDataset.build(src, str(tmp_path / "missing"))

    def test_inference_discovery_matches_training(self, tree):
        src, ref = tree
        ds = MultiDomainDataset.build(src, ref)
        inf_domains = discover_inference_domains(ref)
        # inference idx = position+1 must equal training domain_to_idx
        for name in inf_domains:
            if name in ds.domain_to_idx:
                assert ds.domain_to_idx[name] == inf_domains.index(name) + 1

    def test_file_listing_sorted(self, tree):
        src, _ = tree
        files = list_image_files(src)
        assert files == sorted(files)
        assert len(files) == 5


class TestSampling:
    def test_source_index_modulo_and_uniform_domain(self, tree):
        src, ref = tree
        ds = MultiDomainDataset.build(src, ref)
        rng = np.random.default_rng(0)
        s, t, idx = ds.sample_paths(7, rng)
        assert s == ds.source_files[7 % 5]
        assert 1 <= idx <= 3
        # uniform over domains, not images: DomainB (2 imgs) appears ~1/3
        counts = {1: 0, 2: 0, 3: 0}
        for i in range(3000):
            _, _, idx = ds.sample_paths(i, rng)
            counts[idx] += 1
        for c in counts.values():
            assert abs(c / 3000 - 1 / 3) < 0.05


class TestCropAndDecode:
    def test_crop_params_in_bounds(self):
        rng = np.random.default_rng(0)
        for _ in range(200):
            top, left, h, w = random_resized_crop_params(rng, 40, 60)
            assert 0 <= top <= 40 - h and 0 <= left <= 60 - w
            assert 0 < h <= 40 and 0 < w <= 60

    def test_train_image_shape(self, tree):
        src, _ = tree
        ds_files = list_image_files(src)
        arr = load_train_image(ds_files[0], 32, np.random.default_rng(0))
        assert arr.shape == (32, 32, 3) and arr.dtype == np.uint8

    def test_inference_image_shape(self, tree):
        src, _ = tree
        arr = load_inference_image(list_image_files(src)[0], 48)
        assert arr.shape == (48, 48, 3) and arr.dtype == np.uint8


class TestTrainLoader:
    def test_epoch_batches(self, tree):
        src, ref = tree
        ds = MultiDomainDataset.build(src, ref)
        loader = TrainLoader(ds, batch_size=2, image_size=32, seed=1, num_threads=2)
        assert loader.steps_per_epoch() == 2  # 5 // 2, drop_last
        batches = list(loader.epoch(0))
        assert len(batches) == 2
        b = batches[0]
        assert b["source"].shape == (2, 32, 32, 3)
        assert b["target"].shape == (2, 32, 32, 3)
        assert b["source"].dtype == np.uint8
        assert (b["source_domain"] == 0).all()
        assert ((b["target_domain"] >= 1) & (b["target_domain"] <= 3)).all()

    def test_epochs_differ_and_are_reproducible(self, tree):
        src, ref = tree
        ds = MultiDomainDataset.build(src, ref)
        loader = TrainLoader(ds, batch_size=2, image_size=16, seed=1, num_threads=1)
        e0a = list(loader.epoch(0))
        e0b = list(loader.epoch(0))
        e1 = list(loader.epoch(1))
        np.testing.assert_array_equal(e0a[0]["source"], e0b[0]["source"])
        assert not np.array_equal(e0a[0]["source"], e1[0]["source"])

    def test_unreadable_training_image_raises_not_hangs(self, tree, tmp_path):
        """A corrupt file in the source dir must fail the epoch loudly
        (reference parity: its DataLoader crashes too) — never hang the
        consumer on a dead producer thread."""
        import shutil

        src, ref = tree
        src2 = tmp_path / "src2"
        shutil.copytree(src, src2)
        (src2 / "broken.jpg").write_bytes(b"not an image")
        ds = MultiDomainDataset.build(str(src2), ref)
        loader = TrainLoader(ds, batch_size=ds_len_min(ds), image_size=16,
                             seed=0, num_threads=2)
        with pytest.raises(Exception):
            # every sample path gets loaded in the first batch when
            # batch_size == dataset length, so the corrupt file is hit
            list(loader.epoch(0))

    def test_abandoned_epoch_releases_producer_thread(self, tree):
        """A consumer that stops mid-epoch (profile_steps, an exception in
        the train loop) must not leave the prefetch thread blocked in
        q.put() holding batch references for process lifetime."""
        import gc
        import threading
        import time

        src, ref = tree
        ds = MultiDomainDataset.build(src, ref)
        # prefetch=1 so the producer is certainly blocked mid-put when the
        # consumer walks away after one batch (5 steps per epoch at bs=1).
        loader = TrainLoader(ds, batch_size=1, image_size=16, seed=0,
                             num_threads=1, prefetch=1)
        it = loader.epoch(0)
        next(it)
        it.close()  # runs the generator's finally: stop + drain
        del it
        gc.collect()
        deadline = time.time() + 5.0
        while time.time() < deadline:
            if not any(t.name == "msig-train-prefetch" and t.is_alive()
                       for t in threading.enumerate()):
                return
            time.sleep(0.05)
        raise AssertionError("msig-train-prefetch thread still alive 5s after abandonment")


def ds_len_min(ds):
    return len(ds)
