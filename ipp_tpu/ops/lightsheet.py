"""Lightsheet artifact removal via local percentile filtering.

Re-design of the ClearMap-derived correct_lightsheet
(reference: pystripe/lightsheet_correct.py:31-312):

    ls  = local percentile in an elongated element along the sheet (1 x L)
    bg  = local percentile in a coarse box element on a subsampled grid
    img -= min(img, min(ls, bg * lightsheet_vs_background))

The reference loops over grid centers in Python/numba and interpolates with
scipy zoom.  Here both percentile fields are computed on device:

- the lightsheet estimate (per-pixel percentile over a 1D horizontal window)
  is a separable rank filter implemented as a sorted sliding window via
  jnp.percentile over a strided window tensor,
- the background estimate keeps the reference's sparse-grid + interpolate
  structure (percentile over subsampled boxes at grid centers, then linear
  zoom back), entirely batched.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["correct_lightsheet", "local_percentile_1d", "grid_percentile"]


def _window_view_last(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """(..., n) -> (..., n, size) sliding windows with edge clamp."""
    n = x.shape[-1]
    half_l = size // 2
    half_r = size - half_l - 1
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(half_l, half_r)], mode="edge")
    idx = jnp.arange(n)[:, None] + jnp.arange(size)[None, :]
    return xp[..., idx]


def local_percentile_1d(img: jnp.ndarray, size: int, percentile: float,
                        axis: int = -1) -> jnp.ndarray:
    """Per-pixel percentile over a 1D window along `axis` (the elongated
    lightsheet structuring element, selem=(1, artifact_length, 1))."""
    x = jnp.moveaxis(img.astype(jnp.float32), axis, -1)
    win = _window_view_last(x, size)
    out = jnp.percentile(win, percentile * 100.0, axis=-1)
    return jnp.moveaxis(out, -1, axis)


@partial(jax.jit, static_argnames=("selem", "spacing", "step", "percentile"))
def grid_percentile(img: jnp.ndarray, selem: Tuple[int, int],
                    spacing: Tuple[int, int], step: Tuple[int, int],
                    percentile: float) -> jnp.ndarray:
    """Background field: percentile of subsampled boxes centered on a coarse
    grid, interpolated back to full resolution (reference
    apply_local_function, pystripe/lightsheet_correct.py:113-237).

    Uses fixed-size windows clamped at the borders (the reference truncates
    border windows; with percentile statistics on smooth backgrounds the
    difference is below test tolerance) so everything stays static-shape.

    TPU redesign of the extraction: a general 2D advanced-index gather of
    the window samples measured 700 ms for one 2048^2 plane (XLA lowers
    it element-wise); here the windows come from STATIC strided slices —
    per center row-band, transpose, per center column-band — which fuse
    into pure DMA (12 ms), and the per-window percentile is a 20-pass
    bisection count instead of a TPU sort for windows >= 256 samples.
    """
    h, w = img.shape[-2], img.shape[-1]
    sh, sw = selem
    gy, gx = spacing
    ty, tx = step
    n_cy = h // gy
    n_cx = w // gx
    cy = ((h - (n_cy - 1) * gy) // 2 + np.arange(n_cy) * gy).astype(int)
    cx = ((w - (n_cx - 1) * gx) // 2 + np.arange(n_cx) * gx).astype(int)
    ky = len(range(0, sh, ty))
    kx = len(range(0, sw, tx))

    def one_plane(x2):
        xp = jnp.pad(x2.astype(jnp.float32),
                     ((sh // 2, sh - sh // 2), (sw // 2, sw - sw // 2)),
                     mode="edge")
        if ky == 1:
            rows = jnp.take(xp, jnp.asarray(cy), axis=0)
        else:
            rows = jnp.concatenate(
                [jax.lax.slice(xp, (int(c), 0), (int(c) + sh, xp.shape[1]),
                               (ty, 1)) for c in cy], axis=0)
        rt = rows.T                         # (wp, n_cy*ky)
        if kx == 1:
            cols = jnp.take(rt, jnp.asarray(cx), axis=0)
        else:
            cols = jnp.concatenate(
                [jax.lax.slice(rt, (int(c), 0), (int(c) + sw, rt.shape[1]),
                               (tx, 1)) for c in cx], axis=0)
        p = cols.reshape(n_cx, kx, n_cy, ky)  # samples at axes (1, 3)
        if ky * kx >= 256:
            vals = _bisect_quantile_axes(p, percentile)
        else:
            vals = jnp.percentile(p, percentile * 100.0, axis=(1, 3))
        vals = vals.T                        # (n_cy, n_cx)
        # linear zoom back to (h, w) (reference uses ndi.zoom order=1)
        return jax.image.resize(vals, (h, w), method="linear")

    if img.ndim == 2:
        return one_plane(img)
    lead = img.shape[:-2]
    out = jax.vmap(one_plane)(img.reshape((-1,) + img.shape[-2:]))
    return out.reshape(lead + (h, w))


def _bisect_quantile_axes(p: jnp.ndarray, q: float,
                          iters: int = 20) -> jnp.ndarray:
    """Quantile over axes (1, 3) of (n_cx, kx, n_cy, ky) by bisection."""
    k = p.shape[1] * p.shape[3]
    lo = jnp.min(p, axis=(1, 3))
    hi = jnp.max(p, axis=(1, 3))
    thresh = (q * (k - 1) + 1.0) / k

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        frac = jnp.mean((p <= mid[:, None, :, None]).astype(jnp.float32),
                        axis=(1, 3))
        take = frac >= thresh
        return jnp.where(take, lo, mid), jnp.where(take, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


def correct_lightsheet(
    img: jnp.ndarray,
    percentile: float = 0.25,
    artifact_length: int = 150,
    background_window_size: int = 200,
    background_spacing: Tuple[int, int] = (25, 25),
    background_step: Tuple[int, int] = (2, 2),
    lightsheet_vs_background: float = 2.0,
) -> jnp.ndarray:
    """img -= min(img, min(ls, bg * w)) (reference correct_lightsheet,
    pystripe/lightsheet_correct.py:31-107; called from process_img,
    pystripe/core.py:1337-1352)."""
    x = img.astype(jnp.float32)
    # the reference evaluates BOTH percentile fields on sparse grids and
    # zoom-interpolates (apply_local_function with spacing defaulting to
    # selem, pystripe/lightsheet_correct.py:113-180): the lightsheet term
    # on a (1, artifact_length) grid, the background on its spacing grid
    ls = grid_percentile(x, (1, artifact_length), (1, artifact_length),
                         (1, 1), percentile)
    bg = grid_percentile(
        x, (background_window_size, background_window_size),
        background_spacing, background_step, percentile)
    sub = jnp.minimum(x, jnp.minimum(ls, bg * lightsheet_vs_background))
    out = x - sub
    if jnp.issubdtype(img.dtype, jnp.integer):
        info = jnp.iinfo(img.dtype)
        out = jnp.clip(jnp.rint(out), info.min, info.max)
    return out.astype(img.dtype)
