"""Annotator: stroke raster, undo/redo, ROI zoom math (reference
annotator.py behaviors)."""

import numpy as np

from interactive_unet_tpu.session.annotator import Annotator
from interactive_unet_tpu.ops.colors import COLORS


def _mk(size=64, canvas=64):
    a = Annotator(canvas)
    img = np.zeros((size, size, 3), np.uint8)
    a.set_image(img)
    return a


def _paint(a, x0, y0, x1, y1, brush=8, color="rgb(230,25,75)"):
    a.new_path(x0, y0, brush, color)
    a.continue_path(x0, y0, x1, y1, brush, color)
    a.apply_current_path()


def test_stroke_rasterizes():
    a = _mk()
    _paint(a, 10, 10, 40, 40)
    assert (a.mask == np.array([230, 25, 75])).all(-1).any()


def test_undo_redo():
    a = _mk()
    _paint(a, 10, 10, 40, 40)
    painted = a.mask.copy()
    a.undo_annotation()
    assert a.mask.sum() == 0
    a.redo_annotation()
    np.testing.assert_array_equal(a.mask, painted)


def test_num_unique_colors():
    a = _mk()
    _paint(a, 5, 5, 10, 10, color="rgb(230,25,75)")
    _paint(a, 30, 30, 35, 35, color="rgb(60,180,75)")
    assert a.get_num_unique_colors() == 2


def test_svg_overlay_nonempty():
    a = _mk()
    a.new_path(10, 10, 8, "rgb(230,25,75)")
    a.continue_path(10, 10, 20, 20, 8, "rgb(230,25,75)")
    svg = a.get_current_path_overlay()
    assert "<circle" in svg and "<line" in svg


def test_zoom_in_out_roundtrip():
    a = _mk()
    a.zoom_in(32, 32)
    assert a.scale < 1.0
    a.zoom_out(32, 32)
    np.testing.assert_allclose(a.scale, 1.0, rtol=1e-9)
    np.testing.assert_allclose(a.roi, [0, 0, 1, 1], atol=1e-9)


def test_roi_image_identity():
    a = _mk()
    a.display_image = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64) % 255
    roi = a.get_roi_image()
    # identity ROI: nearest resample of the full image at canvas size
    assert roi.shape == (64, 64)
    np.testing.assert_array_equal(roi, a.display_image)


def test_capture_overlay_mode():
    a = _mk()
    overlay = np.zeros((64, 64, 3), np.uint8)
    overlay[:, :] = COLORS[3]
    a.overlays["model_predictions"] = overlay
    a.new_path(20, 20, 10, "rgb(0,0,0)", mode="capture_overlay",
               overlay="model_predictions")
    a.continue_path(20, 20, 30, 30, 10, "rgb(0,0,0)", mode="capture_overlay",
                    overlay="model_predictions")
    a.apply_current_path()
    assert (a.mask == COLORS[3]).all(-1).any()
