"""Utils tests: grid rendering, value-range mapping, plotting artifacts."""

import os

import numpy as np
from PIL import Image

from msig_tpu.utils import (
    add_text_to_image,
    plot_losses,
    plot_weight_history,
    save_image,
    save_sample_grid,
    to_uint8,
)


class TestGrid:
    def test_to_uint8_range_mapping(self):
        img = np.array([[[-1.0, 0.0, 1.0]]], np.float32)
        u8 = to_uint8(img)
        np.testing.assert_array_equal(u8, [[[0, 128, 255]]])
        # out-of-range values clip
        u8 = to_uint8(np.array([[[-2.0, 2.0, 0.5]]], np.float32))
        assert u8[0, 0, 0] == 0 and u8[0, 0, 1] == 255

    def test_add_text_changes_pixels(self):
        img = np.zeros((64, 64, 3), np.uint8)
        out = add_text_to_image(img, "Real A")
        assert out.shape == img.shape
        assert (out != img).any()  # text drawn

    def test_save_sample_grid_layout(self, tmp_path):
        # 4 images, 2 per row, 2px padding -> (2*16+3*2, 2*16+3*2)
        imgs = np.zeros((4, 16, 16, 3), np.float32)
        imgs[1] = 1.0  # one white tile
        path = str(tmp_path / "grid.png")
        save_sample_grid(imgs, path, nrow=2, domain_names=None)
        grid = np.asarray(Image.open(path))
        assert grid.shape == (38, 38, 3)
        assert grid[0, 0, 0] == 0  # padding black
        assert grid[2, 2, 0] == 128  # first tile: 0.0 in [-1,1] -> mid gray
        assert grid[2, 20, 0] == 255  # second tile: 1.0 -> white

    def test_save_image(self, tmp_path):
        path = str(tmp_path / "x.png")
        save_image(np.zeros((8, 8, 3), np.float32), path)
        assert np.asarray(Image.open(path)).shape == (8, 8, 3)


class TestPlots:
    def test_loss_plot_written(self, tmp_path):
        path = str(tmp_path / "losses.png")
        plot_losses({"G_loss": [1.0, 0.5], "D_loss": [0.4, 0.3]}, path)
        assert os.path.exists(path)

    def test_loss_plot_skipped_when_empty(self, tmp_path):
        path = str(tmp_path / "empty.png")
        plot_losses({"G_loss": [], "D_loss": []}, path)
        assert not os.path.exists(path)

    def test_weight_plot_written(self, tmp_path):
        path = str(tmp_path / "weights.png")
        plot_weight_history({"gan": [1.0, 0.9], "cycle": [10.0, 9.0]}, path)
        assert os.path.exists(path)
