"""Tracking-image annotation (host side, numpy/OpenCV drawing).

Mirrors ``VizUtils::DrawTracking`` (VizUtils.cpp:476-579): flow lines
from the previous to the current position, feature points colored by
age (fresh = red -> stable = green, saturating at
``max_age_for_color``), the detection grid, and clustered-cell
highlighting. Outlier features (post-init chi2 outliers) are skipped,
matching the reference's post-init behavior.
"""

from __future__ import annotations

import numpy as np

from ..config import VisualizationConfig


def _age_color(age: np.ndarray, max_age: int, stable_age: int) -> np.ndarray:
    """[N] ages -> [N,3] uint8 RGB: red (new) to green (stable)."""
    t = np.clip(age.astype(np.float32) / max(max_age, 1), 0.0, 1.0)
    r = ((1.0 - t) * 255).astype(np.uint8)
    g = (t * 255).astype(np.uint8)
    colors = np.stack([r, g, np.zeros_like(r)], axis=-1)
    colors[age >= stable_age, 2] = 60  # slight blue tint once stable
    return colors


def draw_tracking(
    image: np.ndarray,  # [H,W] float in [0,1] or uint8 grayscale
    uv: np.ndarray,  # [N,2] current pixel positions
    prev_uv: np.ndarray,  # [N,2] previous positions (flow line start)
    valid: np.ndarray,  # [N] bool
    age: np.ndarray,  # [N] int frames since birth
    outlier: np.ndarray | None = None,  # [N] bool skip (chi2 outliers)
    viz: VisualizationConfig = VisualizationConfig(),
    grid_cols: int = 20,
    grid_rows: int = 10,
) -> np.ndarray:
    """Render the tracking overlay; returns [H,W,3] uint8 RGB."""
    import cv2

    if image.dtype != np.uint8:
        img8 = np.clip(np.asarray(image, np.float32) * 255.0, 0, 255).astype(np.uint8)
    else:
        img8 = image
    canvas = cv2.cvtColor(img8, cv2.COLOR_GRAY2RGB)
    h, w = img8.shape[:2]

    if viz.show_grid:
        gc = tuple(int(c) for c in viz.grid_color)
        for cx in range(1, grid_cols):
            x = int(round(cx * w / grid_cols))
            cv2.line(canvas, (x, 0), (x, h - 1), gc, viz.grid_thickness)
        for cy in range(1, grid_rows):
            y = int(round(cy * h / grid_rows))
            cv2.line(canvas, (0, y), (w - 1, y), gc, viz.grid_thickness)

    uv = np.asarray(uv, np.float32)
    prev_uv = np.asarray(prev_uv, np.float32)
    valid = np.asarray(valid, bool)
    age = np.asarray(age)
    show = valid if outlier is None else (valid & ~np.asarray(outlier, bool))
    colors = _age_color(age, viz.max_age_for_color, viz.stable_age_threshold)

    idx = np.flatnonzero(show)
    for i in idx:
        x1, y1 = prev_uv[i]
        x2, y2 = uv[i]
        c = tuple(int(v) for v in colors[i])
        # Skip flow lines that cross the ERP seam (would smear across
        # the whole image); the point itself is still drawn.
        if abs(x2 - x1) < w / 2:
            cv2.line(canvas, (int(x1), int(y1)), (int(x2), int(y2)), c, 1, cv2.LINE_AA)
        cv2.circle(canvas, (int(x2), int(y2)), 2, c, -1, cv2.LINE_AA)

    if viz.highlight_clustered_grid:
        clustered = _clustered_cells(uv, show, w, h, grid_cols, grid_rows, viz.clustered_std_ratio)
        cc = tuple(int(c) for c in viz.clustered_grid_color)
        cw, ch = w / grid_cols, h / grid_rows
        for cy, cx in zip(*np.nonzero(clustered)):
            p1 = (int(cx * cw), int(cy * ch))
            p2 = (int((cx + 1) * cw), int((cy + 1) * ch))
            cv2.rectangle(canvas, p1, p2, cc, 1)

    if viz.scale != 1.0:
        canvas = cv2.resize(
            canvas, (int(w * viz.scale), int(h * viz.scale)), interpolation=cv2.INTER_AREA
        )
    return canvas


def _clustered_cells(uv, valid, w, h, cols, rows, std_ratio) -> np.ndarray:
    """[rows, cols] bool: cells whose >=4 features have tiny position
    std (FeatureTracker.cpp:404-497 criterion, host-side replica)."""
    out = np.zeros((rows, cols), bool)
    if not valid.any():
        return out
    cx = np.clip((uv[:, 0] / (w / cols)).astype(int), 0, cols - 1)
    cy = np.clip((uv[:, 1] / (h / rows)).astype(int), 0, rows - 1)
    diag = float(np.hypot(w / cols, h / rows))
    for r in range(rows):
        for c in range(cols):
            sel = valid & (cx == c) & (cy == r)
            if sel.sum() >= 4:
                pts = uv[sel]
                std = float(np.sqrt(pts.var(axis=0).sum()))
                if std < std_ratio * diag:
                    out[r, c] = True
    return out
