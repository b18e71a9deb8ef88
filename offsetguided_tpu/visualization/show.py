"""Pose/feature-map visualization (matplotlib).

Capability parity with reference visualization/show.py: skeleton painting
with per-keypoint confidence styling, image canvases, heatmap overlays and
guiding-offset quiver plots for debugging.
"""
from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import numpy as np

from ..config.defaults import SkeletonConfig


@contextlib.contextmanager
def canvas(fig_file: Optional[str] = None, show: bool = False, **kwargs):
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(**kwargs)
    yield ax
    fig.set_tight_layout(True)
    if fig_file:
        fig.savefig(fig_file, dpi=150)
    if show:
        plt.show()
    plt.close(fig)


@contextlib.contextmanager
def image_canvas(image: np.ndarray, fig_file: Optional[str] = None,
                 show: bool = False, fig_width: float = 10.0, **kwargs):
    import matplotlib.pyplot as plt
    h, w = image.shape[:2]
    fig = plt.figure(figsize=(fig_width, fig_width * h / w))
    ax = plt.Axes(fig, [0., 0., 1., 1.])
    ax.set_axis_off()
    fig.add_axes(ax)
    ax.imshow(image)
    yield ax
    if fig_file:
        fig.savefig(fig_file, dpi=150)
    if show:
        plt.show()
    plt.close(fig)


class KeypointPainter:
    """Draw multi-person skeletons (reference visualization/show.py
    KeypointPainter)."""

    def __init__(self, *, skeleton_cfg: SkeletonConfig = SkeletonConfig(),
                 markersize: float = 3.0, linewidth: float = 2.0,
                 highlight_threshold: float = 0.5, show_box: bool = False):
        self.cfg = skeleton_cfg
        self.markersize = markersize
        self.linewidth = linewidth
        self.thr = highlight_threshold
        self.show_box = show_box

    def keypoints(self, ax, poses: np.ndarray,
                  scores: Optional[Sequence[float]] = None,
                  skeleton=None):
        import matplotlib
        skeleton = skeleton or self.cfg.skeleton
        cmap = matplotlib.colormaps['tab20']
        for pi, pose in enumerate(np.asarray(poses)):
            color = cmap(pi % 20)
            xs, ys, vs = pose[:, 0], pose[:, 1], pose[:, 2]
            for a, b in skeleton:
                if vs[a] > 0 and vs[b] > 0:
                    solid = vs[a] > self.thr and vs[b] > self.thr
                    ax.plot([xs[a], xs[b]], [ys[a], ys[b]], '-' if solid
                            else '--', color=color, linewidth=self.linewidth)
            vis = vs > 0
            ax.plot(xs[vis], ys[vis], 'o', markersize=self.markersize,
                    color=color)
            if self.show_box and vis.any():
                x0, x1 = xs[vis].min(), xs[vis].max()
                y0, y1 = ys[vis].min(), ys[vis].max()
                ax.add_patch(__import__('matplotlib.patches',
                                        fromlist=['Rectangle']).Rectangle(
                    (x0, y0), x1 - x0, y1 - y0, fill=False, color=color))
                if scores is not None:
                    ax.text(x0, y0, f'{scores[pi]:.2f}', color=color)


def heatmap_overlay(ax, image: np.ndarray, hmp: np.ndarray,
                    channel: Optional[int] = None, alpha: float = 0.5):
    """Show a heatmap channel (or the max over channels) over an image."""
    h = hmp[..., channel] if channel is not None else hmp.max(-1)
    ax.imshow(image)
    ax.imshow(h, alpha=alpha, cmap='jet',
              extent=(0, image.shape[1], image.shape[0], 0))


def draw_limb_offset(ax, omp: np.ndarray, limb: int, stride: int = 4,
                     step: int = 2, threshold: float = 1e3):
    """Quiver plot of one limb's guiding offsets (finite cells only)."""
    off = omp[..., 2 * limb:2 * limb + 2]
    hh, ww = off.shape[:2]
    ys, xs = np.mgrid[0:hh:step, 0:ww:step]
    u = off[::step, ::step, 0]
    v = off[::step, ::step, 1]
    finite = np.isfinite(u) & np.isfinite(v) & (np.abs(u) < threshold)
    ax.quiver(xs[finite] * stride + stride / 2 - 0.5,
              ys[finite] * stride + stride / 2 - 0.5,
              u[finite], v[finite], angles='xy', scale_units='xy', scale=1,
              color='cyan', width=0.002)
