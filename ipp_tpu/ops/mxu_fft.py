"""3D FFT as MXU matmuls — the TPU-native transform for RL deconvolution.

XLA's TPU FFT runs on the VPU and measures ~8 ms per 270^3 rFFT — the
round-1 deconvolution bound (docs/STATUS.md).  A DFT expressed as dense
matmuls runs on the MXU instead: for the n=200..600 sizes this pipeline
uses, one n x n DFT matrix per axis gives contraction dims that map
perfectly onto the 128x128 systolic array, and the O(n^4) flops (vs
O(n^3 log n)) are cheap because the MXU has ~2 orders of magnitude more
flops than the VPU.  This is the standard TPU trick for moderate-size
FFTs (cf. the reference's cuFFT-bound deconFFT, decon.m:127-204, which
this replaces).

Layout / precision notes:
- complex arrays are carried as (re, im) float32 pairs — TPU has no
  native complex type, and explicit pairs let each of the 4 (or 3 with
  Karatsuba) real matmuls hit the MXU with chosen precision;
- the last axis stores only n//2+1 frequencies (rfft): the input volume
  is real, Hermitian symmetry halves the work of every later stage;
- forward matrices are exp(-2*pi*i*j*k/n); the inverse of the half axis
  folds Hermitian symmetry and the 1/n into a single reconstruction
  matrix, so irfftn is matmuls only (no concatenation/masking);
- `precision` defaults to HIGHEST (6-pass bf16 ~ f32-exact on the MXU);
  DEFAULT (1-pass bf16) is ~2e-3 relative — usable where the 1e-3 output
  tolerance has margin, exposed for benchmarking.

Unlike the smooth-size constraint of the XLA path (ops/fftutil), any size
works here; multiples of 8 (f32 sublane) keep layouts tight.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MatmulFFT3", "plan_shape"]


def plan_shape(shape: Sequence[int], psf_shape: Sequence[int]) -> Tuple[int, ...]:
    """FFT work shape for the matmul backend: block + PSF half-extents,
    rounded up to a multiple of 8 (f32 sublane tile).  No smoothness
    constraint — a dense DFT matmul handles any n."""
    out = []
    for s, p in zip(shape, psf_shape):
        n = int(s) + int(p) // 2 * 2
        out.append(-(-n // 8) * 8)
    return tuple(out)


@lru_cache(maxsize=64)
def _dft_mats(n: int):
    """(Cr, Ci) with F[j,k] = exp(-2*pi*i*j*k/n) = Cr + i*Ci, float32."""
    jk = np.outer(np.arange(n), np.arange(n)) % n
    w = np.exp(-2j * np.pi * jk / n)
    return (np.ascontiguousarray(w.real.astype(np.float32)),
            np.ascontiguousarray(w.imag.astype(np.float32)))


@lru_cache(maxsize=64)
def _rdft_mats(n: int):
    """Forward half-spectrum matrices: (n, n//2+1)."""
    k = n // 2 + 1
    cr, ci = _dft_mats(n)
    return (np.ascontiguousarray(cr[:, :k]), np.ascontiguousarray(ci[:, :k]))


@lru_cache(maxsize=64)
def _irdft_mats(n: int):
    """Inverse half-spectrum reconstruction: x[j] = Re X @ Ar[k,j] + Im X @ Ai[k,j]
    with Hermitian weights folded in ((k, n) matrices including the 1/n)."""
    k = n // 2 + 1
    jk = np.outer(np.arange(k), np.arange(n))
    wts = np.full(k, 2.0)
    wts[0] = 1.0
    if n % 2 == 0:
        wts[-1] = 1.0
    ar = wts[:, None] * np.cos(2 * np.pi * jk / n) / n
    ai = wts[:, None] * np.sin(2 * np.pi * jk / n) / n  # applied with minus
    return (np.ascontiguousarray(ar.astype(np.float32)),
            np.ascontiguousarray(ai.astype(np.float32)))


@lru_cache(maxsize=64)
def _idft_mats(n: int):
    """Full inverse DFT matrices (1/n * conj(F)), float32 (n, n)."""
    cr, ci = _dft_mats(n)
    return (np.ascontiguousarray(cr.T / n), np.ascontiguousarray(-ci.T / n))


class MatmulFFT3:
    """Plans an rfftn/irfftn pair over the trailing 3 axes of an array
    (leading batch dims pass through), all compute as MXU matmuls.

    Axis order of the transform work shape is (z, y, x); the x axis is
    half-spectrum.  Complex data flows as (re, im) float32 pairs.
    """

    def __init__(self, shape: Sequence[int], precision=None):
        self.shape = tuple(int(s) for s in shape)
        assert len(self.shape) == 3
        if precision is None:
            import os

            # HIGH (3-pass bf16) measured 2e-6 NRMSE over a full 10-iter
            # RL vs HIGHEST at 1.27x the speed; DEFAULT (1-pass) is 4.5e-4
            # — inside the pipeline's 1e-3 budget, opt-in for more speed
            precision = {
                "highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT,
            }[os.environ.get("IPP_TPU_FFT_PRECISION", "high").lower()]
        self.precision = precision
        nz, ny, nx = self.shape
        self.kx = nx // 2 + 1

        def triple(mats):  # (mr, mi, mr+mi) for the Karatsuba product
            mr, mi = (jnp.asarray(m) for m in mats)
            return mr, mi, mr + mi

        # forward x: ONE matmul producing [re | im] (concatenated columns
        # pad the 128-lane boundary once instead of twice)
        fx = _rdft_mats(nx)
        self._fx = jnp.asarray(np.concatenate(fx, axis=1))
        self._fy = triple(_dft_mats(ny))
        self._fz = triple(_dft_mats(nz))
        # inverse x: ONE matmul of the stacked [re; -im] spectrum
        ix = _irdft_mats(nx)
        self._ix = jnp.asarray(np.concatenate([ix[0], -ix[1]], axis=0))
        self._iy = triple(_idft_mats(ny))
        self._iz = triple(_idft_mats(nz))

    # -- primitive stages ---------------------------------------------------

    def _mm_last(self, x, m):
        return jnp.matmul(x, m, precision=self.precision)

    def _cplx_last(self, re, im, mats):
        """(re + i*im) @ (mr + i*mi) along the last axis — Karatsuba with
        3 real matmuls (t1 = re@mr, t2 = im@mi, t3 = (re+im)@(mr+mi);
        rr = t1 - t2, ii = t3 - t1 - t2): 25% fewer MXU flops than the
        4-matmul form, ~1 ulp extra cancellation.

        IPP_TPU_FFT_FUSED=1 routes through the Pallas fused kernel
        (ops/pallas_fft.py): one VMEM-resident pass instead of three
        matmul IO round-trips."""
        import os

        if os.environ.get("IPP_TPU_FFT_FUSED", "0") == "1":
            from .pallas_fft import fused_cplx_matmul

            return fused_cplx_matmul(re, im, mats)
        mr, mi, mri = mats
        p = self.precision
        t1 = jnp.matmul(re, mr, precision=p)
        t2 = jnp.matmul(im, mi, precision=p)
        t3 = jnp.matmul(re + im, mri, precision=p)
        return t1 - t2, t3 - t1 - t2

    @staticmethod
    def _to_last(a, axis):
        return jnp.swapaxes(a, axis, -1)

    # -- public API ----------------------------------------------------------

    def rfftn(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (..., nz, ny, nx) real -> (re, im) of shape (..., nz, ny, kx)."""
        # x axis (real -> half spectrum): one fused matmul -> [re | im]
        both = self._mm_last(x, self._fx)
        re = both[..., :self.kx]
        im = both[..., self.kx:]
        # y axis: swap y to last, 4 matmuls, swap back
        re, im = (self._to_last(re, -2), self._to_last(im, -2))
        re, im = self._cplx_last(re, im, self._fy)
        re, im = (self._to_last(re, -2), self._to_last(im, -2))
        # z axis
        re, im = (self._to_last(re, -3), self._to_last(im, -3))
        re, im = self._cplx_last(re, im, self._fz)
        re, im = (self._to_last(re, -3), self._to_last(im, -3))
        return re, im

    def irfftn(self, re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
        """(re, im): (..., nz, ny, kx) -> real (..., nz, ny, nx)."""
        re, im = (self._to_last(re, -3), self._to_last(im, -3))
        re, im = self._cplx_last(re, im, self._iz)
        re, im = (self._to_last(re, -3), self._to_last(im, -3))
        re, im = (self._to_last(re, -2), self._to_last(im, -2))
        re, im = self._cplx_last(re, im, self._iy)
        re, im = (self._to_last(re, -2), self._to_last(im, -2))
        # x axis: half spectrum -> real, one fused matmul of [re | im]
        # against the stacked [Ar; -Ai] (Hermitian fold in A)
        return self._mm_last(jnp.concatenate([re, im], axis=-1), self._ix)

    # -- fused convolution path ----------------------------------------------
    #
    # The generic rfftn/irfftn pair spends 16 materialized array transposes
    # per convolution (swap-in + swap-out around each non-last-axis matmul,
    # x2 for re/im) — at production sizes that HBM traffic, not MXU flops,
    # is the bound.  The fused path cycles layouts instead of restoring
    # them: (z,y,k) -> (y,k,z) [mm z] -> (Z,k,y) [mm y] -> multiply OTF in
    # (Z,k,Y) -> [mm y^-1] -> (y,k,Z)... -> (z,y,k) [mm x^-1]: 8 transposes.

    def _fwd_packed(self, x: jnp.ndarray):
        """rfftn with the spectrum left in the internal (Z, kx, Y) layout."""
        both = self._mm_last(x, self._fx)          # (..., z, y, 2k)
        re, im = both[..., :self.kx], both[..., self.kx:]
        re = jnp.moveaxis(re, -3, -1)               # (..., y, k, z)
        im = jnp.moveaxis(im, -3, -1)
        re, im = self._cplx_last(re, im, self._fz)  # (..., y, k, Z)
        re = jnp.swapaxes(re, -3, -1)               # (..., Z, k, y)
        im = jnp.swapaxes(im, -3, -1)
        return self._cplx_last(re, im, self._fy)    # (..., Z, k, Y)

    def otf_packed(self, psf_rolled: jnp.ndarray):
        """OTF in the internal layout for :meth:`convolve`."""
        return self._fwd_packed(psf_rolled)

    def convolve(self, x: jnp.ndarray, otf, conj: bool = False) -> jnp.ndarray:
        """Circular convolution irfftn(rfftn(x) * OTF); `otf` comes from
        :meth:`otf_packed`."""
        re, im = self._fwd_packed(x)
        otf_re, otf_im = otf
        if conj:
            otf_im = -otf_im
        rr = re * otf_re - im * otf_im
        ii = re * otf_im + im * otf_re
        rr, ii = self._cplx_last(rr, ii, self._iy)   # (..., Z, k, y)
        rr = jnp.swapaxes(rr, -3, -1)                # (..., y, k, Z)
        ii = jnp.swapaxes(ii, -3, -1)
        rr, ii = self._cplx_last(rr, ii, self._iz)   # (..., y, k, z)
        rr = jnp.moveaxis(rr, -1, -3)                # (..., z, y, k)
        ii = jnp.moveaxis(ii, -1, -3)
        return self._mm_last(jnp.concatenate([rr, ii], axis=-1), self._ix)

    def otf(self, psf_rolled: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Forward transform of an origin-centered padded PSF (canonical
        (z, y, kx) layout — for convolve use :meth:`otf_packed`)."""
        return self.rfftn(psf_rolled)


@partial(jax.jit, static_argnames=("shape",))
def _selftest_roundtrip(x, shape):
    plan = MatmulFFT3(shape)
    return plan.irfftn(*plan.rfftn(x))
