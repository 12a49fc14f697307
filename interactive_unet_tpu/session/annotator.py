"""Canvas-space stroke annotator.

Covers the reference's annotator capability surface (stroke capture with
undo/redo, SVG preview of the in-flight stroke, rasterization into an RGB
class mask, overlay compositing, pan/zoom) with an original data model:

- a stroke is a ``Stroke`` record — one polyline in *normalized slice
  coordinates* plus brush width / color / mode — instead of a list of
  per-segment tuples;
- pan/zoom state is an affine ``Viewport`` (origin + span) that maps canvas
  pixels to normalized slice coordinates; ``roi``/``scale`` are derived views
  kept for API compatibility;
- rasterization is coverage-based: each stroke renders to a single-channel
  coverage bitmap (cv2 polyline + endpoint disks — host UI-latency path,
  SURVEY §2.1), and the covered pixels are then filled from either the flat
  stroke color ("paint") or an overlay image ("capture_overlay"), so both
  modes share one code path;
- the ROI resample is direct numpy nearest-index slicing (no scatter/gather
  kernel needed on this host path).

Behavioral parity target: reference annotator.py:5-271 (capabilities, not
structure).

Parity caveat (intentional UX change): starting a new stroke clears the redo
stack (``new_path`` -> ``undone.clear()``), the standard editor convention.
The reference keeps ``deleted_annotations`` so redo still replays undone
strokes after new paint lands on top of them (reference annotator.py:
add_annotation/redo), which reorders history in surprising ways.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import cv2
import numpy as np


@dataclass
class Stroke:
    """One brush stroke: a polyline in normalized slice coordinates."""

    points: list = field(default_factory=list)  # [(x, y), ...] in [0, 1]
    width: float = 0.0                          # brush diameter, slice units
    color: str = "rgb(0,0,0)"                   # CSS color string
    mode: str = "paint"                         # "paint" | "capture_overlay"
    overlay: str | None = None                  # overlay key for capture mode

    def add(self, x: float, y: float):
        self.points.append((float(x), float(y)))

    def rgb(self) -> tuple:
        inner = self.color.split("(")[-1].split(")")[0]
        r, g, b = (int(v) for v in inner.split(",")[:3])
        return (r, g, b)


class Viewport:
    """Affine canvas→slice map: slice = origin + (canvas_px / canvas) * span.

    The visible region is the square [origin, origin + span]² in normalized
    slice coordinates; span == 1 shows the whole slice.
    """

    def __init__(self, canvas_size: int, zoom_step: float = 1.1):
        self.canvas_size = canvas_size
        self.zoom_step = zoom_step
        self.origin = np.zeros(2)
        self.span = 1.0

    def reset(self):
        self.origin = np.zeros(2)
        self.span = 1.0

    def to_slice(self, px: float, py: float) -> tuple:
        f = self.span / self.canvas_size
        return (self.origin[0] + px * f, self.origin[1] + py * f)

    def to_canvas(self, sx: float, sy: float) -> tuple:
        f = self.canvas_size / self.span
        return ((sx - self.origin[0]) * f, (sy - self.origin[1]) * f)

    def pan(self, px0: float, py0: float, px1: float, py1: float):
        """Drag: keep the grabbed slice point under the cursor."""
        f = self.span / self.canvas_size
        self.origin += np.array([(px0 - px1) * f, (py0 - py1) * f])

    def zoom(self, px: float, py: float, factor: float):
        """Scale the span about the slice point under the cursor."""
        anchor = np.array(self.to_slice(px, py))
        self.span *= factor
        frac = np.array([px, py]) / self.canvas_size
        self.origin = anchor - frac * self.span


class Annotator:
    def __init__(self, canvas_size: int):
        self.canvas_size = canvas_size
        self.view = Viewport(canvas_size)
        self.strokes: list[Stroke] = []
        self.undone: list[Stroke] = []
        self.input_size = 256
        self.image = None
        self.mask = None
        self.overlays: dict[str, np.ndarray] = {}
        self.display_image = None

    # -- derived views kept for API compatibility -----------------------------

    @property
    def scale(self) -> float:
        return self.view.span

    @property
    def roi(self) -> np.ndarray:
        o, s = self.view.origin, self.view.span
        return np.array([o[0], o[1], o[0] + s, o[1] + s])

    @property
    def scale_factor(self) -> float:
        return self.view.zoom_step

    def set_image(self, image: np.ndarray):
        self.input_size = image.shape[0]
        self.image = image
        self.mask = self._blank_mask()
        self.overlays = {}
        self.display_image = image

    def _blank_mask(self) -> np.ndarray:
        return np.zeros((self.input_size, self.input_size, 3), dtype=np.uint8)

    # -- stroke capture -------------------------------------------------------

    def _brush_width(self, brush_size_px: float) -> float:
        return brush_size_px / self.canvas_size * self.view.span

    def new_path(self, x0, y0, brush_size, color, mode="paint", overlay=None):
        s = Stroke(width=self._brush_width(brush_size), color=color,
                   mode=mode, overlay=overlay)
        s.add(*self.view.to_slice(x0, y0))
        self.strokes.append(s)
        self.undone.clear()

    def continue_path(self, x0, y0, x1, y1, brush_size, color, mode="paint",
                      overlay=None):
        del x0, y0, brush_size, color, mode, overlay  # polyline: ends only
        self.strokes[-1].add(*self.view.to_slice(x1, y1))

    def undo_annotation(self):
        if self.strokes:
            self.undone.append(self.strokes.pop())
            self.rebuild_mask()

    def redo_annotation(self):
        if self.undone:
            self.strokes.append(self.undone.pop())
            self.rebuild_mask()

    # -- rasterization --------------------------------------------------------

    def _coverage(self, stroke: Stroke) -> np.ndarray:
        """Render one stroke to a boolean coverage bitmap at slice resolution."""
        n = self.input_size
        cov = np.zeros((n, n), dtype=np.uint8)
        pts = np.array([(int(x * n), int(y * n)) for x, y in stroke.points],
                       dtype=np.int32)
        w = stroke.width * n
        radius = max(int(w / 2), 0)
        cv2.circle(cov, tuple(pts[0]), radius, 1, -1)
        cv2.circle(cov, tuple(pts[-1]), radius, 1, -1)
        if len(pts) > 1:
            cv2.polylines(cov, [pts], False, 1, max(int(w), 1))
        return cov.astype(bool)

    def _apply_stroke(self, stroke: Stroke):
        cov = self._coverage(stroke)
        if stroke.mode == "paint":
            self.mask[cov] = stroke.rgb()
        elif stroke.mode == "capture_overlay":
            src = self.overlays[stroke.overlay]
            self.mask[cov] = src[cov]

    def apply_current_path(self, idx: int = -1):
        self._apply_stroke(self.strokes[idx])

    def rebuild_mask(self):
        self.mask = self._blank_mask()
        for s in self.strokes:
            self._apply_stroke(s)

    def get_num_unique_colors(self) -> int:
        return len({s.color for s in self.strokes})

    def reset(self):
        self.view.reset()
        self.strokes = []
        self.undone = []
        self.mask = self._blank_mask()
        self.overlays = {}
        self.display_image = self.image

    # -- SVG preview of the in-flight stroke ----------------------------------

    def get_current_path_overlay(self, mode="paint") -> str:
        if not self.strokes or self.strokes[-1].mode != mode:
            return ""
        s = self.strokes[-1]
        color = s.color
        d_px = s.width * self.canvas_size / self.view.span
        pts = [self.view.to_canvas(x, y) for x, y in s.points]
        parts = [f'<circle cx="{x}" cy="{y}" r="{d_px / 2}" '
                 f'fill="{color}" stroke="{color}" />' for x, y in pts]
        parts += [f'<line x1="{x0}" y1="{y0}" x2="{x1}" y2="{y1}" '
                  f'stroke="{color}" stroke-width="{d_px}" fill="none" />'
                  for (x0, y0), (x1, y1) in zip(pts[:-1], pts[1:])]
        return "".join(parts)

    # -- display --------------------------------------------------------------

    @staticmethod
    def _matches_any(img: np.ndarray, rgbs) -> np.ndarray:
        """(H, W) bool: pixels of ``img`` equal to ANY of the rgb triples."""
        hit = np.zeros(img.shape[:2], bool)
        for rgb in rgbs:
            hit |= (img == np.asarray(rgb, img.dtype)).all(axis=-1)
        return hit

    def update_display(self, annotation_opacity=0.25, overlay_opacity=0.25,
                       overlay=None, hidden_rgb=()):
        """Composite image + overlay + annotation mask.  ``hidden_rgb`` is
        a collection of (r, g, b) class colors to leave un-blended in both
        the overlay and the painted mask (per-class visibility toggles —
        beyond the reference, which composites all classes always,
        app.py:330-343)."""
        out = self.image.astype(np.float32) / 255.0
        if overlay is not None and overlay in self.overlays \
                and overlay_opacity > 0:
            ov_img = self.overlays[overlay]
            ov = ov_img.astype(np.float32) / 255.0
            a = overlay_opacity
            if hidden_rgb:
                a = np.where(self._matches_any(ov_img, hidden_rgb),
                             0.0, a)[..., None]
            out = out * (1.0 - a) + ov * a
        if annotation_opacity > 0:
            painted = self.mask.any(axis=-1)
            if hidden_rgb:
                painted &= ~self._matches_any(self.mask, hidden_rgb)
            m = self.mask.astype(np.float32) / 255.0
            out[painted] = (out[painted] * (1.0 - annotation_opacity)
                            + m[painted] * annotation_opacity)
        self.display_image = np.rint(out * 255.0).astype(np.uint8)

    # -- pan / zoom -----------------------------------------------------------

    def get_roi_mouse_pos(self, mouse_x, mouse_y):
        return self.view.to_slice(mouse_x, mouse_y)

    def translate(self, x0, y0, x1, y1):
        self.view.pan(x0, y0, x1, y1)

    def zoom_in(self, mouse_x, mouse_y):
        self.view.zoom(mouse_x, mouse_y, 1.0 / self.view.zoom_step)

    def zoom_out(self, mouse_x, mouse_y):
        self.view.zoom(mouse_x, mouse_y, self.view.zoom_step)

    def get_roi_image(self, size: int | None = None) -> np.ndarray:
        """Nearest-resampled view of ``display_image`` for the canvas."""
        size = size or self.canvas_size
        img = self.display_image
        o, s = self.view.origin, self.view.span
        cols = np.rint(np.linspace(o[0], o[0] + s, size)
                       * (img.shape[1] - 1)).astype(np.int64)
        rows = np.rint(np.linspace(o[1], o[1] + s, size)
                       * (img.shape[0] - 1)).astype(np.int64)
        cols = np.clip(cols, 0, img.shape[1] - 1)
        rows = np.clip(rows, 0, img.shape[0] - 1)
        return img[rows[:, None], cols[None, :]]
