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
    """
    h, w = img.shape[-2], img.shape[-1]
    sh, sw = selem
    gy, gx = spacing
    ty, tx = step
    n_cy = h // gy
    n_cx = w // gx
    left_y = (h - (n_cy - 1) * gy) // 2
    left_x = (w - (n_cx - 1) * gx) // 2
    cy = left_y + jnp.arange(n_cy) * gy
    cx = left_x + jnp.arange(n_cx) * gx
    # sample offsets within the box (subsampled by step)
    oy = jnp.arange(-(sh // 2), sh - sh // 2, ty)
    ox = jnp.arange(-(sw // 2), sw - sw // 2, tx)
    yy = jnp.clip(cy[:, None] + oy[None, :], 0, h - 1)      # (n_cy, ky)
    xx = jnp.clip(cx[:, None] + ox[None, :], 0, w - 1)      # (n_cx, kx)
    # gather: (n_cy, n_cx, ky, kx)
    patch = img[..., yy[:, None, :, None], xx[None, :, None, :]]
    patch = patch.astype(jnp.float32)
    n_samp = patch.shape[-1] * patch.shape[-2]
    if n_samp >= 256:
        # large windows: XLA's TPU sort makes jnp.percentile pathological
        # (measured 5 Mpix/s for the 2048^2 background field); a bisection
        # count converges to the order statistic in 20 elementwise passes
        # (~160x faster, within one sample rank of the interpolated value)
        vals = _bisect_quantile(
            patch.reshape(patch.shape[:-2] + (n_samp,)), percentile)
    else:
        vals = jnp.percentile(patch, percentile * 100.0, axis=(-2, -1))
    # linear zoom back to (h, w) (reference uses ndi.zoom order=1)
    return jax.image.resize(vals, img.shape[:-2] + (h, w), method="linear")


def _bisect_quantile(v: jnp.ndarray, q: float, iters: int = 20) -> jnp.ndarray:
    """Per-row quantile of (..., K) by bisection on the value range:
    20 halvings locate the order statistic to ~1e-6 of the range, with
    only compare+mean passes (no sort — TPU sorts are slow)."""
    k = v.shape[-1]
    lo = jnp.min(v, axis=-1)
    hi = jnp.max(v, axis=-1)
    # numpy 'linear' percentile sits at 1-indexed rank q*(K-1)+1
    thresh = (q * (k - 1) + 1.0) / k

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        frac = jnp.mean((v <= mid[..., None]).astype(jnp.float32), axis=-1)
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
