"""Native C++ loader vs PIL: decode, box-resize, rotation, batch API."""

import numpy as np
import pytest
from PIL import Image

from msig_tpu.data import native_loader
from msig_tpu.data.pipeline import load_inference_image, load_train_image

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built"
)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    smooth = rng.integers(0, 255, (5, 6, 3), dtype=np.uint8)
    arr = np.asarray(
        Image.fromarray(smooth).resize((96, 80), Image.BILINEAR), dtype=np.uint8
    )  # smooth content: resize differences stay small
    jpg = root / "a.jpg"
    png = root / "b.png"
    Image.fromarray(arr).save(jpg, quality=95)
    Image.fromarray(arr).save(png)
    return str(jpg), str(png), arr


class TestDecode:
    def test_image_size_header_only(self, images):
        jpg, png, arr = images
        assert native_loader.image_size(jpg) == (96, 80)
        assert native_loader.image_size(png) == (96, 80)

    def test_png_decode_exact(self, images):
        _, png, arr = images
        out = native_loader.decode_resize(png, 80, (0, 0, 80, 80))
        want = np.asarray(
            Image.open(png).convert("RGB").resize((80, 80), Image.BILINEAR, box=(0, 0, 80, 80)),
            dtype=np.uint8,
        )
        assert np.abs(out.astype(int) - want.astype(int)).mean() < 2.0

    def test_jpeg_decode_close_to_pil(self, images):
        jpg, _, arr = images
        out = native_loader.decode_resize(jpg, 64)
        want = np.asarray(
            Image.open(jpg).convert("RGB").resize((64, 64), Image.BILINEAR), dtype=np.uint8
        )
        assert np.abs(out.astype(int) - want.astype(int)).mean() < 3.0

    def test_box_resize_matches_pil(self, images):
        _, png, _ = images
        crop = (10, 20, 40, 50)  # top, left, h, w
        out = native_loader.decode_resize(png, 32, crop)
        want = np.asarray(
            Image.open(png).convert("RGB").resize(
                (32, 32), Image.BILINEAR, box=(20, 10, 20 + 50, 10 + 40)
            ),
            dtype=np.uint8,
        )
        assert np.abs(out.astype(int) - want.astype(int)).mean() < 2.0

    def test_rotation_matches_rot90(self, images):
        _, png, _ = images
        base = native_loader.decode_resize(png, 48)
        for k in range(4):
            rot = native_loader.decode_resize(png, 48, rot_k=k)
            np.testing.assert_array_equal(rot, np.rot90(base, k))


class TestBatch:
    def test_load_batch(self, images):
        jpg, png, _ = images
        out = native_loader.load_batch([jpg, png, jpg], 32, n_threads=2)
        assert out.shape == (3, 32, 32, 3)
        single = native_loader.decode_resize(png, 32)
        np.testing.assert_array_equal(out[1], single)

    def test_batch_failure_raises(self, images, tmp_path):
        jpg, _, _ = images
        with pytest.raises(IOError):
            native_loader.load_batch([jpg, str(tmp_path / "missing.jpg")], 16)


class TestPipelineIntegration:
    def test_backends_agree_on_augmented_sample(self, images):
        jpg, _, _ = images
        a = load_train_image(jpg, 32, np.random.default_rng(7), backend="auto")
        b = load_train_image(jpg, 32, np.random.default_rng(7), backend="pil")
        # same rng draws -> same crop/rotation; pixels near-equal across backends
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 3.0

    def test_inference_image_backends_agree(self, images):
        jpg, _, _ = images
        a = load_inference_image(jpg, 40, backend="auto")
        b = load_inference_image(jpg, 40, backend="pil")
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 3.0
