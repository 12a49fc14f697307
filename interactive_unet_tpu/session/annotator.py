"""Canvas-space stroke annotator (reference annotator.py:5-271 semantics).

Holds the stroke list with undo/redo stacks, renders the in-flight stroke as
SVG, rasterizes completed strokes into a 3-channel color mask (cv2 circles +
lines), composites overlays for display, and manages the pan/zoom ROI with a
nearest-neighbor resample (device-backed via ops.resample instead of scipy).

This is UI-latency host code, not an HBM path (SURVEY §2.1) — cv2's C++
rasterizer is the right tool and stays.
"""

from __future__ import annotations

import cv2
import numpy as np

from ..ops import resample


class Annotator:
    def __init__(self, canvas_size: int):
        self.canvas_size = canvas_size
        self.scale_factor = 1.1
        self.roi = np.array([0.0, 0.0, 1.0, 1.0])
        self.scale = 1.0
        self.annotations = []
        self.deleted_annotations = []
        self.input_size = 256
        self.image = None
        self.mask = None
        self.overlays = {}
        self.display_image = None

    def set_image(self, image: np.ndarray):
        self.input_size = image.shape[0]
        self.image = image
        self.mask = np.zeros((self.input_size, self.input_size, 3), dtype="uint8")
        self.overlays = {}
        self.display_image = image

    # -- stroke capture -----------------------------------------------------

    def new_path(self, x0, y0, brush_size, color, mode="paint", overlay=None):
        x0, y0 = self.get_roi_mouse_pos(x0, y0)
        brush_size = brush_size / self.canvas_size * self.scale
        self.annotations.append(
            [[x0, y0, x0, y0, brush_size, color, mode, overlay]])

    def continue_path(self, x0, y0, x1, y1, brush_size, color, mode="paint",
                      overlay=None):
        x0, y0 = self.get_roi_mouse_pos(x0, y0)
        x1, y1 = self.get_roi_mouse_pos(x1, y1)
        brush_size = brush_size / self.canvas_size * self.scale
        self.annotations[-1].append(
            [x0, y0, x1, y1, brush_size, color, mode, overlay])

    def undo_annotation(self):
        if self.annotations:
            self.deleted_annotations.append(self.annotations.pop())
            self.rebuild_mask()

    def redo_annotation(self):
        if self.deleted_annotations:
            self.annotations.append(self.deleted_annotations.pop())
            self.rebuild_mask()

    # -- rendering ----------------------------------------------------------

    def get_current_path_overlay(self, mode="paint") -> str:
        """SVG preview of the stroke in flight (reference annotator.py:62-87)."""
        svg = ""
        if not self.annotations:
            return svg
        path = self.annotations[-1]
        for j, seg in enumerate(path):
            x0, y0, x1, y1, brush, color, path_mode, _ = seg
            x0 = (x0 - self.roi[0]) * self.canvas_size / self.scale
            y0 = (y0 - self.roi[1]) * self.canvas_size / self.scale
            x1 = (x1 - self.roi[0]) * self.canvas_size / self.scale
            y1 = (y1 - self.roi[1]) * self.canvas_size / self.scale
            brush = brush * self.canvas_size / self.scale
            if path_mode == mode:
                svg += (f'<circle cx="{x0}" cy="{y0}" r="{brush / 2}" '
                        f'fill="{color}" stroke="{color}" />')
                svg += (f'<line x1="{x0}" y1="{y0}" x2="{x1}" y2="{y1}" '
                        f'stroke="{color}" stroke-width="{brush}" fill="none" />')
                if j == len(path) - 1:
                    svg += (f'<circle cx="{x1}" cy="{y1}" r="{brush / 2}" '
                            f'fill="{color}" stroke="{color}" />')
        return svg

    @staticmethod
    def _parse_color(color: str):
        vals = color.split("(")[-1].split(")")[0].split(",")
        return (int(vals[0]), int(vals[1]), int(vals[2]))

    def apply_current_path(self, idx=-1):
        """Rasterize a completed stroke into the mask (annotator.py:89-128)."""
        path = self.annotations[idx]
        for j, seg in enumerate(path):
            x0, y0, x1, y1, brush, color, path_mode, overlay = seg
            x0 = int(x0 * self.input_size)
            y0 = int(y0 * self.input_size)
            x1 = int(x1 * self.input_size)
            y1 = int(y1 * self.input_size)
            brush = brush * self.input_size

            if path_mode == "paint":
                rgb = self._parse_color(color)
                cv2.circle(self.mask, (x0, y0), int(brush / 2), rgb, -1)
                cv2.line(self.mask, (x0, y0), (x1, y1), rgb, int(brush))
                if j == len(path) - 1:
                    cv2.circle(self.mask, (x1, y1), int(brush / 2), rgb, -1)
            elif path_mode == "capture_overlay":
                overlay_mask = self.overlays[overlay]
                cap = np.zeros(overlay_mask.shape[:2])
                cv2.circle(cap, (x0, y0), int(brush / 2), 255, -1)
                cv2.line(cap, (x0, y0), (x1, y1), 255, int(brush))
                if j == len(path) - 1:
                    cv2.circle(cap, (x1, y1), int(brush / 2), 255, -1)
                region = cap == 255
                self.mask[region] = overlay_mask[region]

    def update_display(self, annotation_opacity=0.25, overlay_opacity=0.25,
                       overlay=None):
        image = self.image / 255
        mask = self.mask / 255
        if self.overlays and overlay_opacity > 0 and overlay is not None:
            ov = self.overlays[overlay] / 255
            image = image * (1 - overlay_opacity) + ov * overlay_opacity
        if annotation_opacity > 0:
            region = mask[:, :, 1] > 0
            image[region] = (image[region] * (1 - annotation_opacity)
                             + mask[region] * annotation_opacity)
        self.display_image = np.round(255 * image).astype("uint8")

    def get_num_unique_colors(self) -> int:
        colors = [seg[5] for path in self.annotations for seg in path]
        return len(np.unique(colors).ravel())

    def rebuild_mask(self):
        self.mask = np.zeros((self.input_size, self.input_size, 3), dtype="uint8")
        for i in range(len(self.annotations)):
            self.apply_current_path(i)

    def reset(self):
        self.roi = np.array([0.0, 0.0, 1.0, 1.0])
        self.scale = 1.0
        self.annotations = []
        self.deleted_annotations = []
        self.mask = np.zeros((self.input_size, self.input_size, 3), dtype="uint8")
        self.overlays = {}
        self.display_image = self.image

    # -- pan / zoom ---------------------------------------------------------

    def get_roi_center_pos(self):
        return self.roi[0] + self.scale / 2, self.roi[1] + self.scale / 2

    def get_roi_mouse_pos(self, mouse_x, mouse_y):
        return (self.roi[0] + (mouse_x / self.canvas_size) * self.scale,
                self.roi[1] + (mouse_y / self.canvas_size) * self.scale)

    def translate(self, x0, y0, x1, y1):
        tx = -self.scale * (x1 - x0) / self.canvas_size
        ty = -self.scale * (y1 - y0) / self.canvas_size
        self.roi += np.array([tx, ty, tx, ty])

    def _zoom(self, mouse_x, mouse_y, factor):
        cx, cy = self.get_roi_center_pos()
        mx, my = self.get_roi_mouse_pos(mouse_x, mouse_y)
        self.scale = self.scale * factor
        sx, sy = cx - self.scale / 2, cy - self.scale / 2
        self.roi = np.array([sx, sy, sx + self.scale, sy + self.scale])
        nmx, nmy = self.get_roi_mouse_pos(mouse_x, mouse_y)
        self.roi += np.array([mx - nmx, my - nmy, mx - nmx, my - nmy])

    def zoom_in(self, mouse_x, mouse_y):
        self._zoom(mouse_x, mouse_y, 1 / self.scale_factor)

    def zoom_out(self, mouse_x, mouse_y):
        self._zoom(mouse_x, mouse_y, self.scale_factor)

    def get_roi_image(self, size=None) -> np.ndarray:
        """Nearest-resampled ROI of the display image (annotator.py:254-271),
        via the device resampler instead of scipy."""
        size = size or self.canvas_size
        img = self.display_image
        xs = np.linspace(self.roi[0], self.roi[2], size) * (img.shape[0] - 1)
        ys = np.linspace(self.roi[1], self.roi[3], size) * (img.shape[1] - 1)
        x_grid, y_grid = np.meshgrid(xs, ys)
        coords = np.array([y_grid, x_grid])
        if img.ndim > 2:
            chans = [resample.map_coordinates_2d(img[:, :, i], coords, order=0)
                     [:, :, None] for i in range(img.shape[2])]
            return np.concatenate(chans, axis=2)
        return resample.map_coordinates_2d(img, coords, order=0)
