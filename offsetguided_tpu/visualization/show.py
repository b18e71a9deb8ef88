"""Pose/feature-map visualization (matplotlib).

Capability parity with reference visualization/show.py: skeleton painting
with per-keypoint confidence styling, image canvases, heatmap overlays and
guiding-offset quiver plots for debugging, plus the openpifpaf-style field
renderers (quiver/margins/arrows/boxes/circles, reference show.py:305-439)
and crowd-region painting (CrowdPainter, reference show.py:116-130).

Field renderers take HWC-layout arrays (our framework's native layout; the
reference's are channel-first) and are vectorized with numpy masks instead
of per-pixel Python loops.
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


def _field_grid(shape, intensity_field, step: int, threshold: float):
    """Subsampled grid coordinates + keep-mask shared by the field
    renderers (the per-pixel loops of reference show.py:309-318 et al.,
    done as one strided mask)."""
    hh, ww = shape[:2]
    ys, xs = np.mgrid[0:hh:step, 0:ww:step]
    if intensity_field is not None:
        c = np.asarray(intensity_field)[::step, ::step]
        keep = c >= threshold
    else:
        c = np.ones(xs.shape, np.float32)
        keep = np.ones(xs.shape, bool)
    return xs[keep], ys[keep], c[keep]


def quiver(ax, vector_field: np.ndarray,
           intensity_field: Optional[np.ndarray] = None, *, step: int = 1,
           threshold: float = 0.5, xy_scale: float = 1.0,
           uv_is_offset: bool = False,
           reg_uncertainty: Optional[np.ndarray] = None, **kwargs):
    """Confidence-colored arrow field (reference show.py:305-339).

    vector_field is (H, W, 2) HWC; intensity_field (H, W) gates cells below
    threshold; arrows draw weakest-first so confident ones end up on top.
    With uv_is_offset the field stores absolute targets and the grid
    position is subtracted (the reference's convention). reg_uncertainty
    (H, W) adds an open circle of radius r/2 at each arrow tip.
    """
    vf = np.asarray(vector_field)
    xs, ys, cs = _field_grid(vf.shape, intensity_field, step, threshold)
    if intensity_field is not None:
        keep = np.asarray(intensity_field)[::step, ::step] >= threshold
    else:
        keep = np.ones(vf[::step, ::step, 0].shape, bool)
    u = vf[::step, ::step, 0][keep] * xy_scale
    v = vf[::step, ::step, 1][keep] * xy_scale
    x = xs * xy_scale
    y = ys * xy_scale
    if uv_is_offset:
        u = u - x
        v = v - y
    order = np.argsort(cs)
    if reg_uncertainty is not None:
        import matplotlib.patches
        rr = np.asarray(reg_uncertainty)[::step, ::step][keep] * xy_scale
        for xx, yy, uu, vv, r in zip(x, y, u, v, rr):
            if not r:
                continue
            ax.add_artist(matplotlib.patches.Circle(
                (xx + uu, yy + vv), r / 2.0, zorder=11, linewidth=1,
                fill=False, color='orange'))
    return ax.quiver(x[order], y[order], u[order], v[order], cs[order],
                     angles='xy', scale_units='xy', scale=1, zorder=10,
                     **kwargs)


def margins(ax, vector_field: np.ndarray,
            intensity_field: Optional[np.ndarray] = None, *, step: int = 1,
            threshold: float = 0.5, xy_scale: float = 1.0,
            uv_is_offset: bool = False, **kwargs):
    """Quadrant-margin wedges around regressed targets (reference
    show.py:342-378). vector_field is (H, W, >=6) HWC: channels 0-1 are the
    vector, 2-5 the four quadrant radii; non-finite radii are skipped."""
    import matplotlib.patches
    vf = np.asarray(vector_field)
    if intensity_field is not None:
        keep = np.asarray(intensity_field)[::step, ::step] >= threshold
    else:
        keep = np.ones(vf[::step, ::step, 0].shape, bool)
    hh, ww = vf.shape[:2]
    ys, xs = np.mgrid[0:hh:step, 0:ww:step]
    x = xs[keep] * xy_scale
    y = ys[keep] * xy_scale
    u = vf[::step, ::step, 0][keep] * xy_scale
    v = vf[::step, ::step, 1][keep] * xy_scale
    r = vf[::step, ::step, 2:6][keep] * xy_scale
    if uv_is_offset:
        u = u - x
        v = v - y
    # same quadrant->angle order as the reference (NE, NW, SE, SW)
    wedge_angles = ((0.0, 90.0), (90.0, 180.0), (270.0, 360.0),
                    (180.0, 270.0))
    for xx, yy, uu, vv, rr in zip(x, y, u, v, r):
        for q_rr, (theta1, theta2) in zip(rr, wedge_angles):
            if not np.isfinite(q_rr):
                continue
            ax.add_artist(matplotlib.patches.Wedge(
                (xx + uu, yy + vv), q_rr, theta1, theta2, zorder=9,
                linewidth=1, alpha=0.5 / 16.0, fill=True, color='orange',
                **kwargs))


def arrows(ax, fourd: np.ndarray, *, xy_scale: float = 1.0,
           threshold: float = 0.0, **kwargs):
    """Endpoint-pair association arrows (reference show.py:381-388).

    fourd is (2, 3, M): two endpoints x (x, y, v) x M associations; an
    association is kept when BOTH endpoint confidences reach threshold, and
    arrows are colored by the weaker endpoint, weakest drawn first.
    """
    fourd = np.asarray(fourd)
    c = np.min(fourd[:, 2], axis=0)
    keep = c >= threshold
    fourd = fourd[:, :, keep]
    c = c[keep]
    (x1, y1), (x2, y2) = fourd[:, :2, :] * xy_scale
    order = np.argsort(c)
    return ax.quiver(x1[order], y1[order], (x2 - x1)[order],
                     (y2 - y1)[order], c[order], angles='xy',
                     scale_units='xy', scale=1, zorder=10, **kwargs)


def _scalar_field_artists(ax, scalar_field, intensity_field, xy_scale, step,
                          threshold, cmap, clim, make_patch, kwargs):
    import matplotlib
    sf = np.asarray(scalar_field)
    xs, ys, cs = _field_grid(sf.shape, intensity_field, step, threshold)
    if intensity_field is not None:
        keep = np.asarray(intensity_field)[::step, ::step] >= threshold
    else:
        keep = np.ones(sf[::step, ::step].shape, bool)
    ss = sf[::step, ::step][keep] * xy_scale
    colormap = matplotlib.colormaps[cmap]
    cnorm = matplotlib.colors.Normalize(vmin=clim[0], vmax=clim[1])
    for xx, yy, s, cc in zip(xs * xy_scale, ys * xy_scale, ss, cs):
        ax.add_artist(make_patch(xx, yy, s, colormap(cnorm(cc)), kwargs))


def boxes(ax, scalar_field: np.ndarray,
          intensity_field: Optional[np.ndarray] = None, *,
          xy_scale: float = 1.0, step: int = 1, threshold: float = 0.5,
          cmap: str = 'viridis_r', clim=(0.5, 1.0), **kwargs):
    """Scale-field squares, colormapped by intensity (reference
    show.py:391-410). scalar_field (H, W) holds per-cell half-sizes."""
    import matplotlib.patches

    def make(xx, yy, s, color, kw):
        return matplotlib.patches.Rectangle(
            (xx - s, yy - s), 2.0 * s, 2.0 * s, color=color, zorder=10,
            linewidth=1, **kw)

    _scalar_field_artists(ax, scalar_field, intensity_field, xy_scale, step,
                          threshold, cmap, clim, make, kwargs)


def circles(ax, scalar_field: np.ndarray,
            intensity_field: Optional[np.ndarray] = None, *,
            xy_scale: float = 1.0, step: int = 1, threshold: float = 0.5,
            cmap: str = 'viridis_r', clim=(0.5, 1.0), **kwargs):
    """Scale-field circles, colormapped by intensity (reference
    show.py:413-432). scalar_field (H, W) holds per-cell radii."""
    import matplotlib.patches

    def make(xx, yy, s, color, kw):
        return matplotlib.patches.Circle((xx, yy), s, color=color, zorder=10,
                                         linewidth=1, **kw)

    _scalar_field_artists(ax, scalar_field, intensity_field, xy_scale, step,
                          threshold, cmap, clim, make, kwargs)


class CrowdPainter:
    """Shade crowd-region polygon outlines (reference show.py:116-130)."""

    def __init__(self, *, alpha: float = 0.5, color: str = 'orange'):
        self.alpha = alpha
        self.color = color

    def draw(self, ax, outlines: Sequence[np.ndarray]):
        import matplotlib.collections
        import matplotlib.patches
        patches = []
        for outline in outlines:
            outline = np.asarray(outline)
            if outline.ndim != 2 or outline.shape[1] != 2:
                raise ValueError('outline must be (N, 2) xy points')
            patches.append(matplotlib.patches.Polygon(
                outline, color=self.color, alpha=self.alpha))
        ax.add_collection(matplotlib.collections.PatchCollection(
            patches, match_original=True))


def white_screen(ax, alpha: float = 0.9):
    """Wash the axes with translucent white so overlays stand out
    (reference show.py:435-439)."""
    import matplotlib.patches
    ax.add_patch(matplotlib.patches.Rectangle(
        (0, 0), 1, 1, transform=ax.transAxes, alpha=alpha,
        facecolor='white'))


def load_image(path: str, scale: float = 1.0) -> np.ndarray:
    """Read an RGB image to float [0, scale] (reference show.py:109-113);
    cv2-based (BGR->RGB) instead of PIL."""
    import cv2
    bgr = cv2.imread(path, cv2.IMREAD_COLOR)
    if bgr is None:
        raise FileNotFoundError(path)
    return bgr[:, :, ::-1].astype(np.float32) * (scale / 255.0)
