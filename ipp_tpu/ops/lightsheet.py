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

import math
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


def _band_slices(xp: jnp.ndarray, centers: np.ndarray, size: int,
                 step: int, k: int) -> jnp.ndarray:
    """Rows {c, c+step, ..., c+(k-1)*step} of xp for every center c,
    concatenated along axis 0 -> (len(centers)*k, W).

    TPU form: stride-`step` slicing per center measured 26 ms for the bg
    field of one 2048^2 plane — the strided DMA re-runs per center.  One
    row-wise jnp.take with a precomputed index vector is contiguous DMA
    per row (~2.5 ms true cost; CLAUDE.md row-take rule)."""
    idx = np.concatenate([np.arange(c, c + size, step)[:k]
                          for c in centers]).astype(np.int32)
    return jnp.take(xp, jnp.asarray(idx), axis=0)


def _kary_order_stats(p: jnp.ndarray, ranks, K: int = 16,
                      passes: int = 5) -> jnp.ndarray:
    """Order statistics over axes (1, 3) of (n_cx, kx, n_cy, ky) by K-ary
    counting search: value v_r = smallest sample value with
    count(p <= v) >= r, for each 1-indexed rank r in `ranks`.

    One pass reads p ONCE and evaluates K thresholds per rank (the
    comparisons fuse into the read), narrowing the bracket K-fold — the
    memory-traffic optimum between plain bisection (20 reads) and a sort
    (pathological on TPU).  K=16 x 5 passes resolves range/2^20.
    Returns (R, n_cx, n_cy)."""
    R = len(ranks)
    # extrema/brackets in f32 even for integer sample tensors (p itself
    # stays in its native width; the compares upcast in-register)
    lo = jnp.min(p, axis=(1, 3)).astype(jnp.float32)
    hi = jnp.max(p, axis=(1, 3)).astype(jnp.float32)
    width = hi - lo
    lo = jnp.broadcast_to(lo[None], (R,) + lo.shape) - 1e-3 * (width + 1.0)
    hi = jnp.broadcast_to(hi[None], (R,) + hi.shape)
    rank_arr = jnp.asarray(ranks, jnp.float32)[:, None, None]
    j1 = jnp.arange(1, K + 1, dtype=jnp.float32)

    def body(_, carry):
        lo, hi = carry
        step = (hi - lo) / K                                  # (R, cx, cy)
        # thresholds t_j = lo + j*step, j = 1..K  -> (R, cx, cy, K)
        thr = lo[..., None] + step[..., None] * j1
        cmp = (p[None, :, :, :, :, None] <=
               thr[:, :, None, :, None, :]).astype(jnp.float32)
        cnt = jnp.sum(cmp, axis=(2, 4))                       # (R, cx, cy, K)
        # first bucket whose count reaches the rank (cnt monotone in j)
        found = cnt >= rank_arr[..., None]
        jsel = jnp.argmax(found, axis=-1).astype(jnp.float32)
        new_lo = lo + jsel * step
        new_hi = lo + (jsel + 1.0) * step
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, passes, body, (lo, hi))
    return hi  # the target order stat lies in (lo, hi], width ~ range/K^P


def _bisect_rank_axes(p: jnp.ndarray, rank: float,
                      iters: int = 11) -> jnp.ndarray:
    """Smallest sample value v with count(p <= v) >= rank over axes
    (1, 3), by plain two-way bisection counting — measured FASTER than
    any K>2 counting fan-out on TPU (the broadcast compare across K
    thresholds does not fuse: K=16 measured 30.5 ms vs 14.9 ms for 20
    two-way passes on the 2048^2 bg field).  11 passes resolve the
    bracket to range/2^11 (~32 intensity units at u16 full scale =
    4.9e-4 of range — inside the pipeline's 1e-3 output tolerance; each
    pass reads the full 64x-duplicated window sample tensor, so passes
    are the unit of cost and set the ~6 ms/2048^2-plane floor)."""
    lo = jnp.min(p, axis=(1, 3)).astype(jnp.float32)
    hi = jnp.max(p, axis=(1, 3)).astype(jnp.float32)
    lo = lo - 1e-3 * (hi - lo + 1.0)
    r = jnp.float32(rank)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((p <= mid[:, None, :, None]).astype(jnp.float32),
                      axis=(1, 3))
        take = cnt >= r
        return jnp.where(take, lo, mid), jnp.where(take, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return hi


def _kary_quantile_axes(p: jnp.ndarray, q: float, K: int = 16,
                        passes: int = 5) -> jnp.ndarray:
    """np.percentile-style quantile over axes (1, 3) (the reference's
    prctl is np.percentile, pystripe/lightsheet_correct.py:240-242).

    Small windows (k < 1024) interpolate linearly between the two
    bracketing order statistics via the dual-rank K-ary search; large
    windows (the bg field's k = 10000) return the upper order statistic
    from plain bisection — the interpolation correction is bounded by
    the gap between ADJACENT order statistics, which at k >= 1024 is
    far below the pipeline's 1e-3 output tolerance, and skipping it
    halves the counting work."""
    k = p.shape[1] * p.shape[3]
    pos = q * (k - 1)
    f = pos - math.floor(pos)
    r0 = math.floor(pos) + 1  # 1-indexed count of the lower order stat
    if k >= 1024:
        return _bisect_rank_axes(p, r0 if f < 1e-9 else r0 + f)
    if f < 1e-9 or k == 1:
        return _kary_order_stats(p, [r0], K, passes)[0]
    v = _kary_order_stats(p, [r0, r0 + 1], K, passes)
    return v[0] + jnp.float32(f) * (v[1] - v[0])


def _resize_linear_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) linear-resize weight matrix with ENDPOINT alignment
    x_in = o * (n_in - 1) / (n_out - 1) — the scipy.ndimage.zoom(order=1)
    convention the reference interpolates its sparse grids with
    (pystripe/lightsheet_correct.py:216-226 ndi_zoom); verified
    empirically against scipy."""
    if n_out == 1 or n_in == 1:
        A = np.zeros((n_out, n_in), np.float32)
        A[:, 0] = 1.0
        return A
    x = np.arange(n_out) * ((n_in - 1) / (n_out - 1))
    x0 = np.floor(x)
    frac = x - x0
    i0 = np.clip(x0.astype(int), 0, n_in - 1)
    i1 = np.clip(x0.astype(int) + 1, 0, n_in - 1)
    A = np.zeros((n_out, n_in), np.float32)
    A[np.arange(n_out), i0] += (1.0 - frac).astype(np.float32)
    A[np.arange(n_out), i1] += frac.astype(np.float32)
    return A


def _resize_linear_mm(vals: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Linear 2D upsample of (..., i, j) as two dense matmuls (MXU) with
    the scipy.ndimage.zoom(order=1) endpoint-aligned taps the reference
    interpolates with (see _resize_linear_weights) — gather-based resizes
    measured 8.6 ms for 81^2 -> 2048^2; the matmul form is sub-ms."""
    ay = jnp.asarray(_resize_linear_weights(vals.shape[-2], shape[0]))
    ax = jnp.asarray(_resize_linear_weights(vals.shape[-1], shape[1]))
    return jnp.einsum("yi,...ij,xj->...yx", ay, vals, ax)


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
    it element-wise); strided slices measured 26 ms (strided DMA per
    center); one row-wise jnp.take with a precomputed index vector is
    contiguous DMA per row (~2.5 ms).  The per-window percentile is
    counting-based (bisection for large windows, interpolated dual-rank
    K-ary for small ones) instead of a TPU sort."""
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
    lead = img.shape[:-2]
    B = int(np.prod(lead)) if lead else 1

    # batch folds into the row-take index vector (vmap would batch the
    # gathers, which lowers pathologically on TPU); the percentile then
    # treats (B * n_cy) as one grid axis.
    # Integer inputs stay in their native width end-to-end: the counting
    # passes below re-read the duplicated window-sample tensor every
    # pass, so u16 samples HALVE the HBM traffic of the whole bandwidth-
    # bound field (measured 10.5 -> ~5 ms for the 2048^2 bg field); the
    # compare upcasts in-register (u16 -> f32 is exact, same counts)
    keep = jnp.issubdtype(img.dtype, jnp.integer)
    x3 = img.reshape((B, h, w))
    if not keep:
        x3 = x3.astype(jnp.float32)
    xp = jnp.pad(x3, ((0, 0), (sh // 2, sh - sh // 2),
                      (sw // 2, sw - sw // 2)), mode="edge")
    Hp, Wp = xp.shape[1], xp.shape[2]
    band = np.concatenate([np.arange(c, c + sh, ty)[:ky] for c in cy])
    row_idx = (np.arange(B)[:, None] * Hp + band[None, :]).reshape(-1)
    rows = jnp.take(xp.reshape(B * Hp, Wp),
                    jnp.asarray(row_idx.astype(np.int32)), axis=0)
    rt = rows.T                                # (Wp, B*n_cy*ky)
    cols = _band_slices(rt, cx, sw, tx, kx)    # (n_cx*kx, B*n_cy*ky)
    p = cols.reshape(n_cx, kx, B * n_cy, ky)   # samples at axes (1, 3)
    vals = _kary_quantile_axes(p, percentile)  # (n_cx, B*n_cy)
    vals = vals.reshape(n_cx, B, n_cy).transpose(1, 2, 0)  # (B, n_cy, n_cx)
    # linear zoom back to (h, w) (reference uses ndi.zoom order=1)
    out = _resize_linear_mm(vals, (h, w))
    return out.reshape(lead + (h, w)) if lead else out[0]


@partial(jax.jit, static_argnames=(
    "percentile", "artifact_length", "background_window_size",
    "background_spacing", "background_step", "lightsheet_vs_background"))
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
    pystripe/core.py:1337-1352).

    Jitted as ONE program: the two percentile-field extractions, the
    bisection passes and the final minimum fuse/overlap instead of
    dispatching eagerly (measured 354 -> ~390 Mpix/s on a 2048^2 plane)."""
    x = img.astype(jnp.float32)
    # the reference evaluates BOTH percentile fields on sparse grids and
    # zoom-interpolates (apply_local_function with spacing defaulting to
    # selem, pystripe/lightsheet_correct.py:113-180): the lightsheet term
    # on a (1, artifact_length) grid, the background on its spacing grid.
    # The fields get the ORIGINAL (integer-width) plane — grid_percentile
    # keeps integer samples native, halving the counting passes' HBM
    # traffic (u16 -> f32 compare upcasts are exact)
    ls = grid_percentile(img, (1, artifact_length), (1, artifact_length),
                         (1, 1), percentile)
    bg = grid_percentile(
        img, (background_window_size, background_window_size),
        background_spacing, background_step, percentile)
    sub = jnp.minimum(x, jnp.minimum(ls, bg * lightsheet_vs_background))
    out = x - sub
    if jnp.issubdtype(img.dtype, jnp.integer):
        info = jnp.iinfo(img.dtype)
        out = jnp.clip(jnp.rint(out), info.min, info.max)
    return out.astype(img.dtype)
