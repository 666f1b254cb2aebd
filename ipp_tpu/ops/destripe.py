"""Wavelet-FFT destriping — fused TPU kernel path.

TPU-first re-design of pystripe's destriping engine
(reference: pystripe/core.py:637-1158):

    log1p -> pad (wrap) -> wavedec2 -> per-level gaussian-notch the stripe
    subband's rFFT -> waverec2 -> bleach correction -> expm1 -> round/clip

The whole chain is one jittable function over static tile shapes; batching is
a leading axis (vmap-free — everything is written batched), so thousands of
tiles stream through one compiled executable per tile shape.

Deviations by design (documented):
- DWT runs in periodization mode (see ipp_tpu.ops.wavelets); the reference's
  'symmetric' DWT boundary handling is replaced by rounding the wrap-pad up
  to a multiple of 2**level, which also keeps all shapes static for XLA.
- Otsu-based automatic thresholds are computed host-side (ipp_tpu.ops.stats)
  and passed in as scalars, keeping the device path free of data-dependent
  control flow.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import wavelets as wv
from .intensity import correct_bleaching, expm1_clip, log1p_f32

__all__ = [
    "notch",
    "notch_rise_point",
    "calculate_pad_size",
    "filter_coefficient",
    "filter_subband",
    "filter_streaks",
]


def notch(length: int, sigma: float) -> np.ndarray:
    """1D gaussian notch 1 - exp(-x^2 / (2 sigma^2))
    (reference np_notch, pystripe/core.py:657-676)."""
    if length <= 0:
        raise ValueError("notch: length must be positive")
    if sigma <= 0:
        raise ValueError("notch: sigma must be positive")
    g = np.arange(length, dtype=np.float32)
    return (1.0 - np.exp(-(g ** 2) / (2.0 * float(sigma) ** 2))).astype(np.float32)


def notch_rise_point(sigma: float, rise: float) -> int:
    """Length at which the notch reaches `rise`
    (reference: pystripe/core.py:671-679)."""
    return int(math.sqrt(-2.0 * sigma ** 2 * math.log(1.0 - rise)) + 0.5) // 2 * 2


def calculate_pad_size(shape: Tuple[int, int], sigma: int, rise: float = 0.5) -> int:
    """Pad size from the notch rise point, memory-capped
    (reference: pystripe/core.py:681-698; the c=5e14 constant is the
    reference's GPU-memory heuristic, kept for behavioral parity)."""
    if sigma == 0:
        return 0
    x = shape[1] + 1
    y = shape[0] + 1
    c = 5e14
    sqrt_xyc = math.sqrt(x ** 2 - 2 * x * y + y ** 2 + 4 * c)
    rise = min(round(1 - math.exp((x + y - sqrt_xyc) / (4 * sigma ** 2)), 2) - 0.01, rise)
    return notch_rise_point(sigma, rise)


# Notch backend: 'matmul' evaluates irfft(rfft(x) * g) as ONE circulant
# matmul on the MXU — measured 2.26 ms vs 5.59 ms for the rfft/irfft pair
# at the level-1 coefficient shape (16, 832, 832) on a v5e (the XLA TPU FFT
# runs on the VPU), max abs err 1.1e-4 on unit-normal coefficients at HIGH
# precision (golden destripe tolerance is 8e-3 interior NRMSE).  'auto'
# uses matmul on TPU up to _NOTCH_MM_MAX_N lanes (the n^2 matrix loses to
# n log n upstream of ~4k) and the rfft path elsewhere.
_NOTCH_BACKEND = os.environ.get("IPP_TPU_NOTCH", "auto")
_NOTCH_MM_MAX_N = 4096
_NOTCH_PREC = jax.lax.Precision.HIGH


# byte-bounded LRU (ADVICE r3): an lru_cache(64) of n x n f32 matrices can
# hold ~4.3 GB at n=4096; production shape variety is tiny (bucketed tile
# shapes), so 512 MB keeps every hot entry while bounding pathology
import threading as _threading
from collections import OrderedDict as _OrderedDict

_NOTCH_CACHE: "_OrderedDict[Tuple[int, float], np.ndarray]" = _OrderedDict()
_NOTCH_CACHE_MAX_BYTES = int(os.environ.get("IPP_TPU_NOTCH_CACHE_MB",
                                            "512")) << 20
_NOTCH_CACHE_LOCK = _threading.Lock()


def _notch_circulant(n: int, sigma: float) -> np.ndarray:
    """(n, n) circulant K with x @ K == irfft(rfft(x) * notch(sigma/2))."""
    key = (n, sigma)
    with _NOTCH_CACHE_LOCK:
        m = _NOTCH_CACHE.get(key)
        if m is not None:
            _NOTCH_CACHE.move_to_end(key)
            return m
    g = notch(n // 2 + 1, 0.5 * sigma).astype(np.float64)
    col = np.fft.irfft(g, n=n)
    idx = (np.arange(n)[None, :] - np.arange(n)[:, None]) % n
    m = col[idx].astype(np.float32).T
    with _NOTCH_CACHE_LOCK:
        _NOTCH_CACHE[key] = m
        total = sum(v.nbytes for v in _NOTCH_CACHE.values())
        while total > _NOTCH_CACHE_MAX_BYTES and len(_NOTCH_CACHE) > 1:
            _, old = _NOTCH_CACHE.popitem(last=False)
            total -= old.nbytes
    return m


def _notch_use_matmul(n: int) -> bool:
    if _NOTCH_BACKEND == "matmul":
        return True
    if _NOTCH_BACKEND != "auto":
        return False
    if n > _NOTCH_MM_MAX_N:
        return False
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:  # pragma: no cover
        plat = "cpu"
    return "tpu" in plat or "axon" in plat


def filter_coefficient(coef: jnp.ndarray, width_frac: float, axis: int = -1) -> jnp.ndarray:
    """rFFT-notch-irFFT a detail-coefficient array along `axis`
    (reference np_filter_coefficient, pystripe/core.py:749-754: the notch
    sigma is coef.shape[axis+1] * width_frac).

    The notch applied to complex rfft bin k uses sigma/2: the reference's
    production (Linux) path multiplies scipy.fftpack's PACKED real-FFT
    layout — where bin k occupies indices 2k-1/2k — by a length-n notch
    (core.py:751-753), which is a sigma/2 notch in complex-bin space
    (g_sigma(2k) == g_{sigma/2}(k)); its torch path makes the halving
    explicit (core.py:768, `sigma / 2`).  Using sigma unhalved doubles
    the suppressed band (measured 9.2e-2 vs 2.6e-2 max deviation from
    the packed path on white noise — the residual 2.6e-2 is the
    reference's own numpy-vs-torch spread from the re/im index
    off-by-one in the packed layout)."""
    if axis == -1:
        sigma = coef.shape[-2] * width_frac
    elif axis == -2:
        sigma = coef.shape[-1] * width_frac
    else:
        raise ValueError("axis must be -1 or -2")
    n = coef.shape[axis]
    if _notch_use_matmul(n):
        K = jnp.asarray(_notch_circulant(n, float(sigma)))
        if axis == -1:
            return jnp.matmul(coef, K, precision=_NOTCH_PREC)
        # axis == -2: contract the sublane axis in place (the MXU rhs
        # contracts over sublanes natively — no transpose materializes;
        # measured in scripts/dwt_experiments.py)
        return jnp.einsum("kh,...kw->...hw", K, coef,
                          precision=_NOTCH_PREC)
    f = jnp.fft.rfft(coef, axis=axis)
    g = jnp.asarray(notch(f.shape[axis], 0.5 * sigma))
    shape = [1] * f.ndim
    shape[axis] = f.shape[axis]
    f = f * g.reshape(shape)
    return jnp.fft.irfft(f, n=n, axis=axis)


def filter_subband(img: jnp.ndarray, sigma: float, level: int, wavelet: str,
                   axes: Union[int, Tuple[int, ...]] = -1) -> jnp.ndarray:
    """Notch-filter the stripe subbands of a wavelet decomposition
    (reference filter_subband, pystripe/core.py:840-940, numpy path).

    img: (..., H, W) float32, H and W divisible by 2**level.
    """
    if isinstance(axes, int):
        axes = (axes,)
    h, w = img.shape[-2], img.shape[-1]
    if level == 0:
        level = wv.dwt_max_level(min(h, w), wavelet)
        level = max(min(level, _max_divisible_level(h, w)), 1)
    coeffs = wv.wavedec2(img, wavelet, level)
    out = [coeffs[0]]
    for det in coeffs[1:]:
        ch, cv, cd = det
        if -1 in axes:
            ch = filter_coefficient(ch, sigma / img.shape[-2], axis=-1)
        if -2 in axes:
            cv = filter_coefficient(cv, sigma / img.shape[-1], axis=-2)
        out.append((ch, cv, cd))
    return wv.waverec2(out, wavelet)


def _max_divisible_level(h: int, w: int) -> int:
    lv = 0
    while h % 2 == 0 and w % 2 == 0 and min(h, w) >> 1 >= 2:
        h >>= 1
        w >>= 1
        lv += 1
    return lv


def _plan_padding(shape: Tuple[int, int], sigma: Tuple[int, int], level: int,
                  wavelet: str) -> Tuple[int, Tuple[int, int], Tuple[int, int], int]:
    """Compute (base_pad, extra(y,x), padded_shape, level) such that the padded
    shape is divisible by 2**level (reference pad logic:
    pystripe/core.py:1083-1110 plus the periodization divisibility rule)."""
    base_pad = calculate_pad_size(shape, max(sigma))
    min_len = 34  # reference min_image_length for db9 (pystripe/core.py:1094)
    py = max(0, min_len - (shape[0] + 2 * base_pad))
    px = max(0, min_len - (shape[1] + 2 * base_pad))
    h = shape[0] + 2 * base_pad + py
    w = shape[1] + 2 * base_pad + px
    if level == 0:
        level = wv.dwt_max_level(min(h, w), wavelet)
        level = max(1, min(level, 7))
    mult = 1 << level
    py += (-h) % mult
    px += (-w) % mult
    return base_pad, (py, px), (shape[0] + 2 * base_pad + py, shape[1] + 2 * base_pad + px), level


@partial(jax.jit, static_argnames=(
    "sigma", "level", "wavelet", "crossover", "padding_mode", "bidirectional",
    "bleach_correction_frequency", "bleach_correction_max_method",
    "log1p_normalization_needed", "out_dtype", "use_thresholding"))
def _filter_streaks_impl(img, threshold, bleach_clip_min, bleach_clip_med,
                         bleach_clip_max, *, sigma, level, wavelet, crossover,
                         padding_mode, bidirectional, bleach_correction_frequency,
                         bleach_correction_max_method, log1p_normalization_needed,
                         out_dtype, use_thresholding=False):
    sigma1, sigma2 = sigma
    x = img
    if log1p_normalization_needed:
        x = log1p_f32(x)
    else:
        x = x.astype(jnp.float32)

    if not (sigma1 == sigma2 == 0):
        base_pad, (py, px), padded_shape, lv = _plan_padding(
            x.shape[-2:], sigma, level, wavelet)
        pad = [(0, 0)] * (x.ndim - 2) + [(base_pad, base_pad + py),
                                         (base_pad, base_pad + px)]
        x = jnp.pad(x, pad, mode=padding_mode)
        axes = (-1, -2) if bidirectional else (-1,)
        # dual-band logic (reference filter_streak_dual_band,
        # pystripe/core.py:943-979)
        if use_thresholding and sigma1 != sigma2 and threshold is not None:
            # thresholded fg/bg split with sigmoid crossover blend
            # (pystripe/core.py:948-978; incompatible with log1p, caller
            # passes log1p_normalization_needed=False).  A band with
            # sigma == 0 stays the UNCLIPPED image — the reference only
            # clips the copy it is about to filter.
            from .intensity import foreground_fraction

            fg = x
            if sigma1 > 0:
                fg = filter_subband(jnp.clip(x, threshold, None), sigma1,
                                    lv, wavelet, axes=axes)
            bg = x
            if sigma2 > 0:
                bg = filter_subband(jnp.clip(x, None, threshold), sigma2,
                                    lv, wavelet, axes=axes)
            # smoothing=0: the reference's GaussianBlur return value is
            # DISCARDED (pystripe/core.py:600), so its shipped foreground
            # mask is unsmoothed — match shipped behavior
            frac = foreground_fraction(x, threshold, crossover, smoothing=0)
            x = (fg * frac + bg * (1.0 - frac)) * threshold
        elif sigma1 > 0 and sigma1 == sigma2:
            x = filter_subband(x, sigma1, lv, wavelet, axes=axes)
        else:
            if sigma1 > 0:
                x = filter_subband(x, sigma1, lv, wavelet, axes=axes)
            if sigma2 > 0:
                x = filter_subband(x, sigma2, lv, wavelet, axes=axes)
        x = x[..., base_pad: x.shape[-2] - (base_pad + py),
              base_pad: x.shape[-1] - (base_pad + px)]

    if bleach_correction_frequency is not None:
        x = correct_bleaching(
            x, bleach_correction_frequency, bleach_clip_min, bleach_clip_med,
            bleach_clip_max, max_method=bleach_correction_max_method)

    if log1p_normalization_needed:
        x = expm1_clip(x, out_dtype)
    elif jnp.issubdtype(jnp.dtype(out_dtype), jnp.integer):
        info = jnp.iinfo(out_dtype)
        x = jnp.clip(jnp.rint(x), info.min, info.max).astype(out_dtype)
    else:
        x = x.astype(out_dtype)
    return x


def filter_streaks(
    img: jnp.ndarray,
    sigma: Union[float, Tuple[float, float]] = (250, 250),
    level: int = 0,
    wavelet: str = "db9",
    crossover: float = 10,
    threshold: Optional[float] = None,
    padding_mode: str = "wrap",
    bidirectional: bool = False,
    bleach_correction_frequency: Optional[float] = None,
    bleach_correction_max_method: bool = False,
    bleach_correction_clip_min: Optional[float] = None,
    bleach_correction_clip_med: Optional[float] = None,
    bleach_correction_clip_max: Optional[float] = None,
    log1p_normalization_needed: bool = True,
    use_thresholding: bool = False,
) -> jnp.ndarray:
    """Destripe (and optionally bleach-correct) a tile or batch of tiles
    (reference filter_streaks, pystripe/core.py:982-1160).

    img: (..., H, W), any integer or float dtype.  Returns the same dtype.
    Automatic multi-otsu estimation of missing bleach clip values is the
    caller's job (host-side; see ipp_tpu.ops.stats.threshold_multiotsu) —
    pass the resolved scalars here.
    """
    if not isinstance(sigma, (tuple, list)):
        sigma = (sigma, sigma)
    sigma = (float(sigma[0]), float(sigma[1]))
    if sigma[0] == sigma[1] == 0 and bleach_correction_frequency is None:
        return img
    if bleach_correction_frequency is not None and (
            bleach_correction_clip_min is None or bleach_correction_clip_med is None
            or bleach_correction_clip_max is None):
        raise ValueError(
            "bleach correction clips must be resolved host-side first "
            "(use ipp_tpu.ops.stats.threshold_multiotsu on log1p(img))")
    if use_thresholding and threshold is None:
        raise ValueError(
            "use_thresholding requires an explicit threshold; resolve it "
            "host-side (ipp_tpu.ops.stats.threshold_otsu) — the reference "
            "computes Otsu inline (pystripe/core.py:948-950)")
    if threshold is not None and threshold <= 0:
        # reference routes non-positive thresholds to a single sigma1-band
        # filter (filter_streak_dual_band, pystripe/core.py:945-946)
        use_thresholding = False
        sigma = (sigma[0], sigma[0])
        if sigma[0] == 0 and bleach_correction_frequency is None:
            return img
    out_dtype = img.dtype
    zero = jnp.float32(0)
    return _filter_streaks_impl(
        img,
        zero if threshold is None else jnp.float32(threshold),
        zero if bleach_correction_clip_min is None else jnp.float32(bleach_correction_clip_min),
        zero if bleach_correction_clip_med is None else jnp.float32(bleach_correction_clip_med),
        zero if bleach_correction_clip_max is None else jnp.float32(bleach_correction_clip_max),
        sigma=sigma,
        level=int(level),
        wavelet=wavelet,
        crossover=float(crossover),
        padding_mode=padding_mode,
        bidirectional=bool(bidirectional),
        bleach_correction_frequency=(
            None if bleach_correction_frequency is None else float(bleach_correction_frequency)),
        bleach_correction_max_method=bool(bleach_correction_max_method),
        log1p_normalization_needed=bool(log1p_normalization_needed),
        out_dtype=str(np.dtype(out_dtype)),
        use_thresholding=bool(use_thresholding),
    )
