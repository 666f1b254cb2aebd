"""Import shims that let reference pystripe modules run VERBATIM as goldens.

``load_pystripe_core()`` imports /root/reference/pystripe/core.py unmodified
and returns the module, with its heavy/unavailable dependencies replaced by
the minimal stand-ins below.  The only shim that carries real numerics is
the pywt subset (symmetric-mode ``wavedec2``/``waverec2``): PyWavelets is
not installed here, so a numpy implementation of its documented conventions
is provided and *validated independently* in tests/test_golden_destripe.py
(pywt doc anchors, perfect reconstruction, filter-defining properties)
before any golden comparison uses it.

Shimmed modules and why each is safe:
- pywt       — numpy subset below (the one numerically-load-bearing shim)
- numexpr    — ``evaluate`` re-implemented via caller-frame eval over numpy
               (pystripe also ships pure-numpy branches; core.USE_NUMEXPR is
               forced False so this is belt-and-braces)
- numba      — identity ``jit``/``njit`` (the decorated functions are plain
               numpy/python)
- cv2        — constants + no-op GaussianBlur.  NOTE the reference discards
               GaussianBlur's return value (pystripe/core.py:600), so its
               shipped foreground smoothing is a no-op; the stub reproduces
               exactly that.
- tifffile   — imread/imwrite wired to ipp_tpu.io.tiff (tsv.volume goldens
               read real tiles through it); only filled if a test installed
               its own functional shim first
- dcimg, ptwt, skimage — import-time placeholders; every code path the
  goldens drive is checked to never call them (core.USE_PYTORCH is forced
  False, thresholds are passed explicitly, masking stays disabled).

This module is the ONE shim registry: golden tests must install reference
dependencies through it (install_shims fills missing attrs only) so test
ordering cannot leave a raising placeholder where another golden needs a
functional stand-in.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np

REF = Path("/root/reference")

__all__ = ["REF", "install_shims", "load_pystripe_core"]


# ---------------------------------------------------------------------------
# pywt subset: symmetric-mode DWT per PyWavelets' documented conventions
# ---------------------------------------------------------------------------
#
# Forward 1D (mode='symmetric'): extend by L-1 half-sample-symmetric samples
# on each side, then out[i] = sum_j ext[2i+1+j] * filt[L-1-j] for
# i < floor((n+L-1)/2)  (equivalently full-convolution samples at 2i+L).
# Inverse 1D: zero-upsample both branches, full-convolve with the synthesis
# filters, sum, and keep samples [L-2 : 2*n_c] (length 2*n_c - L + 2).
# Anchored in tests against the pywt documentation examples for db1 and
# perfect reconstruction for longer filters.


def _as_float(x: np.ndarray) -> np.ndarray:
    if x.dtype in (np.float32, np.float64):
        return x
    return np.asarray(x, np.float64)


def _conv_full_last(u: np.ndarray, f: np.ndarray) -> np.ndarray:
    out = np.zeros(u.shape[:-1] + (u.shape[-1] + len(f) - 1,), u.dtype)
    for m, fm in enumerate(f):
        out[..., m:m + u.shape[-1]] += u * u.dtype.type(fm)
    return out


def _dwt1_last(x: np.ndarray, dec_lo, dec_hi):
    x = _as_float(x)
    L = len(dec_lo)
    n = x.shape[-1]
    ext = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(L - 1, L - 1)],
                 mode="symmetric")
    out_len = (n + L - 1) // 2
    idx = (1 + 2 * np.arange(out_len))[:, None] + np.arange(L)[None, :]
    win = ext[..., idx]  # (..., out_len, L)
    rlo = np.asarray(dec_lo, x.dtype)[::-1]
    rhi = np.asarray(dec_hi, x.dtype)[::-1]
    return win @ rlo, win @ rhi


def _idwt1_last(cA: np.ndarray, cD: np.ndarray, rec_lo, rec_hi):
    cA = _as_float(cA)
    cD = _as_float(cD)
    if cA.shape != cD.shape:
        raise ValueError(f"coefficient shape mismatch {cA.shape} vs {cD.shape}")
    L = len(rec_lo)
    n_c = cA.shape[-1]
    up_a = np.zeros(cA.shape[:-1] + (2 * n_c,), cA.dtype)
    up_d = np.zeros_like(up_a)
    up_a[..., ::2] = cA
    up_d[..., ::2] = cD
    y = (_conv_full_last(up_a, np.asarray(rec_lo, cA.dtype)) +
         _conv_full_last(up_d, np.asarray(rec_hi, cA.dtype)))
    return y[..., L - 2: 2 * n_c]


def _dwt_axis(x, w, axis):
    xm = np.moveaxis(x, axis, -1)
    a, d = _dwt1_last(xm, w.dec_lo, w.dec_hi)
    return np.moveaxis(a, -1, axis), np.moveaxis(d, -1, axis)


def _idwt_axis(a, d, w, axis):
    am = np.moveaxis(a, axis, -1)
    dm = np.moveaxis(d, axis, -1)
    return np.moveaxis(_idwt1_last(am, dm, w.rec_lo, w.rec_hi), -1, axis)


class _ShimWavelet:
    """pywt.Wavelet stand-in: filter bank from ipp_tpu.ops.wavelets
    (derived there from the defining equations, not from pywt; validated
    by the property tests in test_golden_destripe.py)."""

    def __init__(self, name: str):
        from ipp_tpu.ops.wavelets import filter_bank

        dec_lo, dec_hi, rec_lo, rec_hi = filter_bank(name)
        self.name = name
        self.dec_lo = list(dec_lo)
        self.dec_hi = list(dec_hi)
        self.rec_lo = list(rec_lo)
        self.rec_hi = list(rec_hi)
        self.dec_len = self.rec_len = len(self.dec_lo)


def _as_wavelet(wavelet) -> _ShimWavelet:
    if isinstance(wavelet, _ShimWavelet):
        return wavelet
    return _ShimWavelet(wavelet)


def _shim_dwt_max_level(data_len: int, filter_len) -> int:
    if isinstance(filter_len, _ShimWavelet):
        flen = filter_len.dec_len
    elif isinstance(filter_len, str):
        flen = _ShimWavelet(filter_len).dec_len
    else:
        flen = int(filter_len)
    if data_len < flen - 1 or flen < 2:
        return 0
    return int(np.floor(np.log2(data_len / (flen - 1.0))))


def _check_mode(mode: str) -> None:
    if mode != "symmetric":
        raise NotImplementedError(
            f"pywt shim implements mode='symmetric' only, got {mode!r}")


def _shim_dwt(data, wavelet, mode="symmetric", axis=-1):
    _check_mode(mode)
    w = _as_wavelet(wavelet)
    return _dwt_axis(np.asarray(data), w, axis)


def _shim_idwt(cA, cD, wavelet, mode="symmetric", axis=-1):
    _check_mode(mode)
    w = _as_wavelet(wavelet)
    return _idwt_axis(np.asarray(cA), np.asarray(cD), w, axis)


def _shim_wavedec2(data, wavelet, mode="symmetric", level=None, axes=(-2, -1)):
    _check_mode(mode)
    w = _as_wavelet(wavelet)
    ax0, ax1 = tuple(axes)
    a = _as_float(np.asarray(data))
    if level is None:
        level = min(_shim_dwt_max_level(a.shape[ax0], w),
                    _shim_dwt_max_level(a.shape[ax1], w))
    details = []
    for _ in range(int(level)):
        lo0, hi0 = _dwt_axis(a, w, ax0)
        aa, ad = _dwt_axis(lo0, w, ax1)
        da, dd = _dwt_axis(hi0, w, ax1)
        # pywt dwt2: (cA, (cH, cV, cD)) == ('aa', ('da', 'ad', 'dd'))
        # with key letters in axes order
        a = aa
        details.append((da, ad, dd))
    return [a] + details[::-1]


def _shim_waverec2(coeffs, wavelet, mode="symmetric", axes=(-2, -1)):
    _check_mode(mode)
    w = _as_wavelet(wavelet)
    ax0, ax1 = tuple(axes)
    a = _as_float(np.asarray(coeffs[0]))
    for det in coeffs[1:]:
        h, v, d = (np.asarray(c) for c in det)
        # pywt crops a when it is one sample larger than the details
        # (odd-length signals at the level below)
        sl = [slice(None)] * a.ndim
        for ax in (ax0, ax1):
            if a.shape[ax] == h.shape[ax] + 1:
                sl[ax] = slice(0, h.shape[ax])
            elif a.shape[ax] != h.shape[ax]:
                raise ValueError("coefficient shapes are inconsistent")
        a = a[tuple(sl)]
        low = _idwt_axis(a, v, w, ax1)
        high = _idwt_axis(h, d, w, ax1)
        a = _idwt_axis(low, high, w, ax0)
    return a


# ---------------------------------------------------------------------------
# numexpr.evaluate: caller-frame eval over the numpy namespace
# ---------------------------------------------------------------------------

_NUMEXPR_FUNCS = {
    name: getattr(np, name)
    for name in ("where", "exp", "expm1", "log", "log1p", "log10", "sqrt",
                 "abs", "tanh", "sin", "cos", "arctan2", "minimum", "maximum")
}


def _shim_evaluate(ex, local_dict=None, global_dict=None, out=None,
                   casting="safe", **_kw):
    frame = sys._getframe(1)
    ns = dict(frame.f_globals if global_dict is None else global_dict)
    ns.update(frame.f_locals if local_dict is None else local_dict)
    res = eval(ex, dict(_NUMEXPR_FUNCS), ns)  # noqa: S307 - test shim
    if out is not None:
        out[...] = res  # numpy assignment casts like numexpr's 'unsafe'
        return out
    return np.asarray(res)


# ---------------------------------------------------------------------------
# module registration
# ---------------------------------------------------------------------------


def _placeholder(name: str):
    def _raise(*_a, **_k):
        raise NotImplementedError(
            f"{name} is a refshims placeholder; the golden tests must not "
            f"reach it")

    return _raise


def _ensure_module(name: str) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        if "." in name:
            parent, _, child = name.rpartition(".")
            setattr(_ensure_module(parent), child, mod)
    return mod


def install_shims() -> None:
    """Register the stand-in modules (idempotent; fills in missing attrs on
    shims other tests may have installed first)."""
    numba = _ensure_module("numba")
    for attr in ("jit", "njit"):
        if not hasattr(numba, attr):
            def _jit(*args, **kwargs):
                if args and callable(args[0]):
                    return args[0]
                return lambda f: f

            setattr(numba, attr, _jit)

    numexpr = _ensure_module("numexpr")
    if not hasattr(numexpr, "evaluate"):
        numexpr.evaluate = _shim_evaluate
        # real pandas probes the optional numexpr's version at import;
        # give it one, but keep pandas from routing real computations
        # through the caller-frame shim
        numexpr.__version__ = "2.10.2"
        try:
            import pandas as _pd

            _pd.set_option("compute.use_numexpr", False)
        except Exception:
            pass

    pywt = _ensure_module("pywt")
    pywt.Wavelet = _ShimWavelet
    pywt.dwt_max_level = _shim_dwt_max_level
    pywt.dwt = _shim_dwt
    pywt.idwt = _shim_idwt
    pywt.wavedec2 = _shim_wavedec2
    pywt.waverec2 = _shim_waverec2

    # only stub cv2 when the real module isn't present/importable —
    # mutating the real cv2 (identity GaussianBlur!) would corrupt it for
    # every later user in the process (e.g. the movie exporter)
    cv2 = sys.modules.get("cv2")
    if cv2 is None or not getattr(cv2, "__file__", None):
        try:
            import cv2  # noqa: F401, PLC0415
        except ImportError:
            cv2 = _ensure_module("cv2")
            cv2.MORPH_CLOSE = 3
            cv2.MORPH_OPEN = 2
            cv2.morphologyEx = _placeholder("cv2.morphologyEx")
            cv2.floodFill = _placeholder("cv2.floodFill")
            # the reference discards GaussianBlur's return value
            # (pystripe/core.py:600) so its shipped smoothing is a no-op;
            # keep the same signature and return the input unchanged
            cv2.GaussianBlur = lambda src, *a, **k: src

    dcimg = _ensure_module("dcimg")
    if not hasattr(dcimg, "DCIMGFile"):
        dcimg.DCIMGFile = _placeholder("dcimg.DCIMGFile")

    ptwt = _ensure_module("ptwt")
    ptwt.wavedec2 = _placeholder("ptwt.wavedec2")
    ptwt.waverec2 = _placeholder("ptwt.waverec2")

    tifffile = _ensure_module("tifffile")
    if not hasattr(tifffile, "imread"):
        from ipp_tpu.io import tiff as _our_tiff

        tifffile.imread = lambda p, **kw: _our_tiff.imread(p)
        tifffile.imwrite = lambda p, data=None, **kw: _our_tiff.imwrite(p, data)

        def _imsave(target, data=None, compress=None, **kw):
            """tifffile.imsave, incl. the BytesIO form fill_blanks uses
            (tsv/fill_blanks.py:88-90)."""
            if hasattr(target, "write"):
                import tempfile

                with tempfile.NamedTemporaryFile(suffix=".tif") as tmp:
                    _our_tiff.imwrite(
                        tmp.name, data,
                        compression="zlib" if compress else None)
                    target.write(Path(tmp.name).read_bytes())
                return
            _our_tiff.imwrite(target, data,
                              compression="zlib" if compress else None)

        tifffile.imsave = _imsave
    tifffile_inner = _ensure_module("tifffile.tifffile")
    if not hasattr(tifffile_inner, "TiffFileError"):
        class TiffFileError(Exception):
            pass

        tifffile_inner.TiffFileError = TiffFileError

    tqdm_mod = _ensure_module("tqdm")
    if not hasattr(tqdm_mod, "tqdm"):
        class _Tqdm:
            """Progress-bar stand-in (tsv/scan.py uses total= + update())."""

            def __init__(self, iterable=None, total=None, **_kw):
                self._it = iterable

            def __iter__(self):
                return iter(self._it if self._it is not None else ())

            def update(self, n=1):
                pass

            def close(self):
                pass

            def __enter__(self):
                return self

            def __exit__(self, *_a):
                return False

        tqdm_mod.tqdm = _Tqdm

    _ensure_module("skimage")
    sk_filters = _ensure_module("skimage.filters")
    sk_filters.threshold_otsu = _placeholder("skimage.threshold_otsu")
    sk_filters.threshold_multiotsu = _placeholder("skimage.threshold_multiotsu")
    sk_measure = _ensure_module("skimage.measure")
    sk_measure.block_reduce = _placeholder("skimage.block_reduce")
    sk_transform = _ensure_module("skimage.transform")
    sk_transform.resize = _placeholder("skimage.resize")


def _natural_sorted(iterable):
    """tifffile.natural_sorted: numeric-aware string sort."""
    import re

    def key(s):
        return [int(t) if t.isdigit() else t
                for t in re.split(r"(\d+)", str(s))]

    return sorted(iterable, key=key)


def _shim_block_reduce(image, block_size=2, func=np.sum, cval=0,
                       func_kwargs=None):
    """skimage.measure.block_reduce: pad to a block multiple with cval,
    then reduce each block with func (numpy reshape form)."""
    image = np.asarray(image)
    if np.isscalar(block_size):
        block_size = (int(block_size),) * image.ndim
    pad = [(0, (-s) % b) for s, b in zip(image.shape, block_size)]
    if any(p[1] for p in pad):
        image = np.pad(image, pad, mode="constant", constant_values=cval)
    shape = []
    axes = []
    for i, b in enumerate(block_size):
        shape.extend([image.shape[i] // b, b])
        axes.append(2 * i + 1)
    return func(image.reshape(shape), axis=tuple(axes),
                **(func_kwargs or {}))


def _shim_sobel(image, *a, **k):
    """skimage.filters.sobel for 2D: hypot of the axis Sobel derivatives
    (kernels /4, reflect boundaries — scipy.ndimage.sobel matches the
    kernel up to the 1/4 normalization, which cancels in any
    correlation-based consumer)."""
    from scipy.ndimage import sobel as _sp_sobel

    img = np.asarray(image, np.float64)
    return np.hypot(_sp_sobel(img, axis=0, mode="reflect"),
                    _sp_sobel(img, axis=1, mode="reflect")) / 4.0


def install_process_images_shims() -> None:
    """Additional stand-ins needed to import the reference's
    process_images.py / align_images.py verbatim (their ECC alignment path
    is the golden target; the placeholders cover paths the goldens never
    drive).  Requires install_shims() first."""
    mpi4py = _ensure_module("mpi4py")
    if not hasattr(mpi4py, "MPI"):
        mpi4py.MPI = _placeholder("mpi4py.MPI")

    cpufeature_ext = _ensure_module("cpufeature.extension")
    if not hasattr(cpufeature_ext, "CPUFeature"):
        cpufeature_ext.CPUFeature = {"num_virtual_cores": 8,
                                     "num_physical_cores": 8}

    ims_mod = _ensure_module("imaris_ims_file_reader.ims")
    if not hasattr(ims_mod, "ims"):
        ims_mod.ims = _placeholder("imaris_ims_file_reader.ims")

    sk_filters = sys.modules["skimage.filters"]
    sk_filters.sobel = _shim_sobel
    sk_thresh = _ensure_module("skimage.filters.thresholding")
    if not hasattr(sk_thresh, "threshold_multiotsu"):
        sk_thresh.threshold_multiotsu = _placeholder(
            "skimage.threshold_multiotsu")
    sk_measure = sys.modules["skimage.measure"]
    sk_measure.block_reduce = _shim_block_reduce
    sk_transform = sys.modules["skimage.transform"]
    for attr in ("warp", "resize_local_mean"):
        if not hasattr(sk_transform, attr):
            setattr(sk_transform, attr, _placeholder(f"skimage.{attr}"))
    skimage = sys.modules["skimage"]
    if not hasattr(skimage, "feature"):
        sk_feature = _ensure_module("skimage.feature")
        sk_feature.canny = _placeholder("skimage.feature.canny")
        skimage.feature = sk_feature

    tifffile = sys.modules["tifffile"]
    if not hasattr(tifffile, "natural_sorted"):
        tifffile.natural_sorted = _natural_sorted


def load_pystripe_core():
    """Import the reference's pystripe.core verbatim (numpy/pywt code paths
    forced: USE_PYTORCH=False, USE_NUMEXPR=False)."""
    install_shims()
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import pystripe.core as core  # noqa: PLC0415

    core.USE_PYTORCH = False
    core.USE_JAX = False
    core.USE_NUMEXPR = False
    return core
