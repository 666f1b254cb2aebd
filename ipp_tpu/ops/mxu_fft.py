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
    constraint — a dense DFT matmul handles any n.  When the next
    multiple of 128 is within 5%, snap to it: the lane padding is
    physically moved either way, so the snap is nearly free and makes
    the axis eligible for lane-exact matmuls (and the fused stage kernel
    at 256-multiples)."""
    out = []
    for s, p in zip(shape, psf_shape):
        n = int(s) + int(p) // 2 * 2
        n8 = -(-n // 8) * 8
        n128 = -(-n // 128) * 128
        out.append(n128 if n128 <= n8 * 1.05 else n8)
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


# -- Cooley-Tukey radix split (convolve path only) ---------------------------
#
# A dense n-point DFT matmul pads its contraction AND output lane dims to
# multiples of 128: at n=264 that is 384 — 2.1x wasted MXU work.  One
# decimation-in-frequency split n = r*m turns the stage into r m-point
# matmuls with the twiddles FOLDED INTO the matrices
#   X[r*k+s] = sum_t (sum_j x[t+m*j] w_r^{js}) * [w_n^{ts} w_m^{tk}]
#              \____ r-point DFT over j ____/   \___ M_s[t,k] ___/
# so the only extra work is an elementwise r-point butterfly (VPU, fuses).
# The spectrum comes out PERMUTED (s-major, [s,k] = X[r*k+s]); convolve
# keeps it permuted end-to-end (the OTF is computed with the same permuted
# transform and the inverse stage consumes it), so no reorder is ever
# materialized.  For n=264, r=3: contraction 88 -> pads 128, a 3.0x MXU
# flop cut at identical accuracy.  Used only by the packed convolve path —
# the canonical rfftn/irfftn keep natural frequency order.
#
# MEASURED (v5e, 10-iter RL): the relayout XLA inserts for the lane-dim
# split (n -> (r, m)) plus the stack before the batched einsum costs MORE
# than the saved MXU flops — 264^3 HIGH 105 -> 144 ms, 256^3 HIGH 54 ->
# 68 ms.  OFF by default (IPP_TPU_FFT_RADIX=1 opts in); the winning move
# was lane-ALIGNED work shapes instead: a 256^3 dense transform is 1.95x
# faster than 264^3 because every lane-dim byte and MXU pass at 264 pays
# padding to 384 (see pipeline.deconvolve.autosplit).  A Pallas kernel
# that fuses split+butterfly+matmul in VMEM could revisit this.


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


def _on_tpu() -> bool:
    """True when the active backend is a real TPU (incl. the axon tunnel)."""
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:  # pragma: no cover
        plat = "cpu"
    return "tpu" in plat or "axon" in plat


def pick_radix(n: int) -> int:
    """Radix minimizing padded MXU cost pad128(n/r)^2 / (n/r); 1 = dense."""
    import os

    if os.environ.get("IPP_TPU_FFT_RADIX", "0") != "1":
        return 1
    best_r, best_c = 1, _pad128(n) ** 2 / n
    for r in (2, 3, 4):
        if n % r:
            continue
        m = n // r
        c = _pad128(m) ** 2 / m
        if c < best_c - 1e-9:
            best_r, best_c = r, c
    return best_r


@lru_cache(maxsize=64)
def _radix_fwd_mats(n: int, r: int):
    """Twiddle-folded forward matrices, stacked (r, m, m):
    M_s[t, k] = exp(-2i*pi*t*s/n) * exp(-2i*pi*t*k/m)."""
    m = n // r
    t = np.arange(m)[:, None]
    k = np.arange(m)[None, :]
    mats = [np.exp(-2j * np.pi * (t * s / n + (t * k % m) / m))
            for s in range(r)]
    M = np.stack(mats)
    return (np.ascontiguousarray(M.real.astype(np.float32)),
            np.ascontiguousarray(M.imag.astype(np.float32)))


@lru_cache(maxsize=64)
def _radix_inv_mats(n: int, r: int):
    """Twiddle-folded inverse matrices, stacked (r, m, m):
    Minv_s[k, t] = (1/m) exp(+2i*pi*k*t/m) * exp(+2i*pi*s*t/n)
    (the 1/r of the full inverse lives in the s-combine constants)."""
    m = n // r
    t = np.arange(m)[None, :]
    k = np.arange(m)[:, None]
    mats = [np.exp(2j * np.pi * ((k * t % m) / m + s * t / n)) / m
            for s in range(r)]
    M = np.stack(mats)
    return (np.ascontiguousarray(M.real.astype(np.float32)),
            np.ascontiguousarray(M.imag.astype(np.float32)))


def _rpoint_combine(re_parts, im_parts, consts):
    """outs[s] = sum_j (re_j + i*im_j) * consts[j, s], elementwise complex
    with python-float constants (exact zeros/ones skipped — XLA folds the
    rest into fused VPU ops)."""
    n_in, n_out = consts.shape
    outs = []
    for s in range(n_out):
        rr, ii = None, None
        for j in range(n_in):
            cr = float(consts[j, s].real)
            ci = float(consts[j, s].imag)
            if abs(cr) < 1e-15:
                cr = 0.0
            if abs(ci) < 1e-15:
                ci = 0.0
            term_r = None
            term_i = None
            if cr != 0.0:
                term_r = re_parts[j] if cr == 1.0 else re_parts[j] * cr
                term_i = im_parts[j] if cr == 1.0 else im_parts[j] * cr
            if ci != 0.0:
                tr = -(im_parts[j] * ci) if ci != 1.0 else -im_parts[j]
                ti = re_parts[j] * ci if ci != 1.0 else re_parts[j]
                term_r = tr if term_r is None else term_r + tr
                term_i = ti if term_i is None else term_i + ti
            if term_r is not None:
                rr = term_r if rr is None else rr + term_r
                ii = term_i if ii is None else ii + term_i
        outs.append((rr, ii))
    return outs


class MatmulFFT3:
    """Plans an rfftn/irfftn pair over the trailing 3 axes of an array
    (leading batch dims pass through), all compute as MXU matmuls.

    Axis order of the transform work shape is (z, y, x); the x axis is
    half-spectrum.  Complex data flows as (re, im) float32 pairs.
    """

    def __init__(self, shape: Sequence[int], precision=None, storage=None):
        self.shape = tuple(int(s) for s in shape)
        assert len(self.shape) == 3
        import os

        if precision is None:
            # HIGH (3-pass bf16) measured 2e-6 NRMSE over a full 10-iter
            # RL vs HIGHEST at 1.27x the speed; DEFAULT (1-pass) is 4.5e-4
            # — inside the pipeline's 1e-3 budget, opt-in for more speed
            precision = {
                "highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT,
            }[os.environ.get("IPP_TPU_FFT_PRECISION", "high").lower()]
        self.precision = precision
        # Pallas fused stage kernel (radix-2 DIF + 3-pass Karatsuba in
        # VMEM): applies to 256-multiple axes in the packed convolve path.
        # Default: on for TPU (measured 52.0 -> 43.8 ms on the 256^3
        # 10-iter RL, NRMSE 2.3e-5 vs the XLA HIGH path), off elsewhere
        # (interpret mode is for tests); IPP_TPU_FFT_KERNEL=0/1 overrides.
        kflag = os.environ.get("IPP_TPU_FFT_KERNEL", "auto")
        # HIGHEST means bit-conservative f32 matmuls: the Pallas kernels
        # are 3-pass bf16 hi/lo (~2e-5 NRMSE), so auto mode defers to the
        # XLA path then; an explicit IPP_TPU_FFT_KERNEL=1 still wins
        self.use_kernel = (kflag == "1" if kflag in ("0", "1")
                           else (_on_tpu()
                                 and precision != jax.lax.Precision.HIGHEST))
        if storage is None:
            # bf16 intermediate storage halves the HBM traffic of the
            # spectra/transpose chain — the measured bound of the RL loop
            # (docs/STATUS.md: ~80 ms memory floor vs ~14.5 ms/pass MXU at
            # 264^3).  Matmul accumulation stays f32; only the values
            # carried BETWEEN stages round to bf16.
            storage = {
                "f32": jnp.float32,
                "float32": jnp.float32,
                "bf16": jnp.bfloat16,
                "bfloat16": jnp.bfloat16,
            }[os.environ.get("IPP_TPU_FFT_STORAGE", "f32").lower()]
        self.storage = storage
        nz, ny, nx = self.shape
        self.kx = nx // 2 + 1

        def triple(mats):  # (mr, mi, mr+mi) for the Karatsuba product
            # the sum matrix is formed in f32 BEFORE any bf16 cast so
            # Karatsuba's mri = mr + mi holds exactly in the rounded world
            mr, mi = (jnp.asarray(m) for m in mats)
            return (mr.astype(storage), mi.astype(storage),
                    (mr + mi).astype(storage))

        # forward x: ONE matmul producing [re | im] (concatenated columns
        # pad the 128-lane boundary once instead of twice)
        fx = _rdft_mats(nx)
        self._fx = jnp.asarray(np.concatenate(fx, axis=1)).astype(storage)
        self._fy = triple(_dft_mats(ny))
        self._fz = triple(_dft_mats(nz))
        # inverse x: ONE matmul of the stacked [re; -im] spectrum
        ix = _irdft_mats(nx)
        self._ix = jnp.asarray(
            np.concatenate([ix[0], -ix[1]], axis=0)).astype(storage)
        self._iy = triple(_idft_mats(ny))
        self._iz = triple(_idft_mats(nz))
        # packed-path x matrices with the half-spectrum dim padded to a
        # full f32 sublane tile (kxp = round8(kx), zero columns/rows): the
        # spectrum then reshapes (A, kxp, n) <-> (A*kxp, n) as a pure view
        # (the physical layout already pads sublanes to 8), which the
        # fused stage kernel needs
        self.kxp = -(-self.kx // 8) * 8
        fxp = np.zeros((nx, 2 * self.kxp), np.float32)
        fxp[:, :self.kx] = fx[0]
        fxp[:, self.kxp:self.kxp + self.kx] = fx[1]
        self._fx_p = jnp.asarray(fxp).astype(storage)
        ixp = np.zeros((2 * self.kxp, nx), np.float32)
        ixp[:self.kx] = ix[0]
        ixp[self.kxp:self.kxp + self.kx] = -ix[1]
        self._ix_p = jnp.asarray(ixp).astype(storage)
        # radix-split stage plans for the packed convolve path (y/z axes)
        self._fy_rad = self._prep_radix(ny, forward=True)
        self._fz_rad = self._prep_radix(nz, forward=True)
        self._iy_rad = self._prep_radix(ny, forward=False)
        self._iz_rad = self._prep_radix(nz, forward=False)
        # v2 near-transpose-free convolve walk (sublane-form kernels; see
        # ops/pallas_fft.py): y is the rfft axis, z/x radix-2 complex.
        # Measured 43.8 -> 39.5 ms on the 256^3 10-iter RL (284 Mvox/s
        # core, NRMSE 2.2e-5 vs the XLA HIGH path).  Default follows
        # use_kernel (on for TPU); IPP_TPU_FFT_V2=0 forces the v1 walk.
        self._v2 = None
        v2flag = os.environ.get("IPP_TPU_FFT_V2", "auto")
        v2_want = (v2flag == "1" if v2flag in ("0", "1")
                   else self.use_kernel)
        if v2_want and storage == jnp.float32:
            from .pallas_fft import (STAGE_TM, prep_stage_mats,
                                     prep_v2_rfft_mats, prep_v2_stage_mats)

            kp_y = -(-(ny // 2 + 1) // 8) * 8
            # nz % 256 also guarantees the kernel batch A = lead*nz
            # divides _V2_B=8; kp_y % 8 likewise covers the kp batches
            if (nx % 256 == 0 and nz % 256 == 0 and ny % 8 == 0
                    and (kp_y * nz) % STAGE_TM == 0
                    and ny <= 2048):
                # 't' = axis-1-stacking rfft/irfft kernels: kp-major
                # output kills the swapaxes pair around the z-stage
                # (unbatched walks only; IPP_TPU_FFT_V2T=0 reverts)
                tflag = os.environ.get("IPP_TPU_FFT_V2T", "auto")
                self._v2 = dict(
                    kp=kp_y,
                    t=(tflag != "0"),
                    rmats=prep_v2_rfft_mats(ny, kp_y),
                    zmats=prep_v2_stage_mats(nz),
                    xmats=prep_stage_mats(nx))
        # fused-kernel stage matrices (bf16 hi/lo splits), per axis.  The
        # decision is made HERE (statically per plan) so the OTF and the
        # data always use the same spectral permutation: the kernel needs
        # the transform axis to be a 256-multiple (m = n/2 lane-aligned)
        # and the flattened row count (other_axis * kxp, times any batch)
        # to divide the kernel row tile
        self._kern = {}
        self._kern_interpret = False
        if self.use_kernel and storage == jnp.float32:
            from .pallas_fft import STAGE_TM, prep_stage_mats

            for axis_n, other_n in ((nz, ny), (ny, nz)):
                if axis_n % 256 == 0 and (other_n * self.kxp) % STAGE_TM == 0:
                    self._kern[axis_n] = prep_stage_mats(axis_n)
        if self._kern or self._v2 is not None:
            self._kern_interpret = not _on_tpu()

    def _prep_radix(self, n: int, forward: bool):
        r = pick_radix(n)
        if r == 1:
            return None
        if forward:
            Mr, Mi = _radix_fwd_mats(n, r)
            consts = np.exp(-2j * np.pi
                            * np.outer(np.arange(r), np.arange(r)) / r)
        else:
            Mr, Mi = _radix_inv_mats(n, r)
            consts = np.exp(2j * np.pi
                            * np.outer(np.arange(r), np.arange(r)) / r) / r
        st = self.storage
        mats = (jnp.asarray(Mr).astype(st), jnp.asarray(Mi).astype(st),
                jnp.asarray(Mr + Mi).astype(st))
        return (r, mats, consts)

    # -- primitive stages ---------------------------------------------------

    def _mm_last(self, x, m, out_dtype=None):
        out = jnp.matmul(x.astype(self.storage), m,
                         precision=self.precision,
                         preferred_element_type=jnp.float32)
        return out if out_dtype == jnp.float32 else out.astype(self.storage)

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
        st = self.storage
        re = re.astype(st)
        im = im.astype(st)
        f32 = jnp.float32
        t1 = jnp.matmul(re, mr, precision=p, preferred_element_type=f32)
        t2 = jnp.matmul(im, mi, precision=p, preferred_element_type=f32)
        t3 = jnp.matmul((re.astype(f32) + im.astype(f32)).astype(st), mri,
                        precision=p, preferred_element_type=f32)
        return (t1 - t2).astype(st), (t3 - t1 - t2).astype(st)

    def _cplx_batched(self, re, im, mats):
        """Karatsuba complex product batched over the radix dim:
        (..., r, m) x (r, m, m) -> (..., r, m)."""
        mr, mi, mri = mats
        st = self.storage
        f32 = jnp.float32
        re = re.astype(st)
        im = im.astype(st)
        kw = dict(precision=self.precision, preferred_element_type=f32)
        t1 = jnp.einsum("...sm,smk->...sk", re, mr, **kw)
        t2 = jnp.einsum("...sm,smk->...sk", im, mi, **kw)
        t3 = jnp.einsum("...sm,smk->...sk",
                        (re.astype(f32) + im.astype(f32)).astype(st),
                        mri, **kw)
        return (t1 - t2).astype(st), (t3 - t1 - t2).astype(st)

    def _cplx2_last(self, re, im, mats, s):
        """Karatsuba against one radix s-slice of stacked (r, m, m) mats."""
        return self._cplx_last(re, im, tuple(mm[s] for mm in mats))

    def _cplx_radix2_fwd(self, re, im, rad):
        """Radix-2 DIF forward: u0/u1 are CONTIGUOUS lane halves
        (x[:m] +/- x[m:]) — no relayout, unlike the general reshape/stack
        path — then two m-contraction Karatsubas and a concat (permuted
        spectrum, same convention as :meth:`_cplx_radix_fwd`)."""
        _, mats, _ = rad
        m = re.shape[-1] // 2
        a_re, b_re = re[..., :m], re[..., m:]
        a_im, b_im = im[..., :m], im[..., m:]
        r0, i0 = self._cplx2_last(a_re + b_re, a_im + b_im, mats, 0)
        r1, i1 = self._cplx2_last(a_re - b_re, a_im - b_im, mats, 1)
        return (jnp.concatenate([r0, r1], axis=-1),
                jnp.concatenate([i0, i1], axis=-1))

    def _cplx_radix2_inv(self, re, im, rad):
        """Radix-2 inverse of :meth:`_cplx_radix2_fwd`: two Karatsubas on
        the contiguous s-halves, then the butterfly (v0 +/- v1)/2 (the 1/2
        is folded into the inverse matrices' companion consts)."""
        _, mats, _ = rad
        m = re.shape[-1] // 2
        r0, i0 = self._cplx2_last(re[..., :m], im[..., :m], mats, 0)
        r1, i1 = self._cplx2_last(re[..., m:], im[..., m:], mats, 1)
        return (jnp.concatenate([(r0 + r1) * 0.5, (r0 - r1) * 0.5], axis=-1),
                jnp.concatenate([(i0 + i1) * 0.5, (i0 - i1) * 0.5], axis=-1))

    def _cplx_radix_fwd(self, re, im, rad):
        """Radix-split forward stage along the last axis; output is the
        PERMUTED spectrum ([s*m + k] = X[r*k + s]) flattened back to n."""
        r, mats, consts = rad
        if r == 2:
            return self._cplx_radix2_fwd(re, im, rad)
        m = re.shape[-1] // r
        shp = re.shape[:-1] + (r, m)
        re_p = re.reshape(shp)
        im_p = im.reshape(shp)
        outs = _rpoint_combine([re_p[..., j, :] for j in range(r)],
                               [im_p[..., j, :] for j in range(r)], consts)
        ur = jnp.stack([o[0] for o in outs], axis=-2)
        ui = jnp.stack([o[1] for o in outs], axis=-2)
        rr, ii = self._cplx_batched(ur, ui, mats)
        return rr.reshape(re.shape), ii.reshape(im.shape)

    def _cplx_radix_inv(self, re, im, rad):
        """Inverse of :meth:`_cplx_radix_fwd`: consumes the permuted
        spectrum, emits natural order."""
        r, mats, consts = rad
        if r == 2:
            return self._cplx_radix2_inv(re, im, rad)
        m = re.shape[-1] // r
        shp = re.shape[:-1] + (r, m)
        rr, ii = self._cplx_batched(re.reshape(shp), im.reshape(shp), mats)
        outs = _rpoint_combine([rr[..., s, :] for s in range(r)],
                               [ii[..., s, :] for s in range(r)], consts)
        xr = jnp.stack([o[0] for o in outs], axis=-2)
        xi = jnp.stack([o[1] for o in outs], axis=-2)
        return xr.reshape(re.shape), xi.reshape(im.shape)

    def _stage(self, re, im, dense_mats, rad, forward):
        kern = self._kern.get(re.shape[-1])
        if kern is not None:
            from .pallas_fft import fused_stage

            return fused_stage(re, im, kern, forward,
                               interpret=self._kern_interpret)
        if rad is None:
            return self._cplx_last(re, im, dense_mats)
        if forward:
            return self._cplx_radix_fwd(re, im, rad)
        return self._cplx_radix_inv(re, im, rad)

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
        return self._mm_last(jnp.concatenate([re, im], axis=-1), self._ix,
                             out_dtype=jnp.float32)

    # -- fused convolution path ----------------------------------------------
    #
    # The generic rfftn/irfftn pair spends 16 materialized array transposes
    # per convolution (swap-in + swap-out around each non-last-axis matmul,
    # x2 for re/im) — at production sizes that HBM traffic, not MXU flops,
    # is the bound.  The fused path cycles layouts instead of restoring
    # them: (z,y,k) -> (y,k,z) [mm z] -> (Z,k,y) [mm y] -> multiply OTF in
    # (Z,k,Y) -> [mm y^-1] -> (y,k,Z)... -> (z,y,k) [mm x^-1]: 8 transposes.

    def _fwd_packed_v2(self, x: jnp.ndarray, ratio_num=None):
        """v2 forward: (..., z, y, x) -> (re, im) in (..., kp, Z, X) with
        z/x in radix-2-permuted frequency order and kp the sublane-padded
        y half-spectrum.  One transpose pair per transform instead of
        four (see ops/pallas_fft.py v2 section).  With `ratio_num`, the
        transform input is ratio_num / max(x, eps) computed inside the
        first kernel — the RL ratio never touches HBM."""
        from .pallas_fft import (_v2_rfft_call, _v2_rfft_call_t,
                                 _v2_rfft_ratio_call, _v2_rfft_ratio_call_t,
                                 _v2_stage_call, fused_stage)

        v2 = self._v2
        lead = x.shape[:-3]
        nz, ny, nx = self.shape
        x3 = x.reshape((-1, ny, nx))
        fhi, flo = v2["rmats"][0]
        use_t = v2.get("t") and lead == ()  # kp-major only maps unbatched
        if ratio_num is not None:
            num3 = ratio_num.reshape((-1, ny, nx))
            if use_t:
                re, im = _v2_rfft_ratio_call_t(
                    num3, x3, fhi, flo, interpret=self._kern_interpret)
            else:
                re, im = _v2_rfft_ratio_call(
                    num3, x3, fhi, flo, interpret=self._kern_interpret)
        elif use_t:
            re, im = _v2_rfft_call_t(x3, fhi, flo,
                                     interpret=self._kern_interpret)
        else:
            re, im = _v2_rfft_call(x3, fhi, flo,
                                   interpret=self._kern_interpret)
        if not use_t:
            re = re.reshape(lead + (nz, v2["kp"], nx))
            im = im.reshape(lead + (nz, v2["kp"], nx))
            re = jnp.swapaxes(re, -3, -2)     # (..., kp, z, x)
            im = jnp.swapaxes(im, -3, -2)
        zhi, zlo = v2["zmats"][0]
        re3 = re.reshape((-1, nz, nx))
        im3 = im.reshape((-1, nz, nx))
        re3, im3 = _v2_stage_call(re3, im3, zhi, zlo, True,
                                  interpret=self._kern_interpret)
        re = re3.reshape(lead + (v2["kp"], nz, nx))
        im = im3.reshape(lead + (v2["kp"], nz, nx))
        return fused_stage(re, im, v2["xmats"], True,
                           interpret=self._kern_interpret)

    def _convolve_v2(self, x, otf, conj, ratio_num=None, mul_abs=None):
        from .pallas_fft import (_v2_irfft_call, _v2_irfft_call_t,
                                 _v2_irfft_mul_call, _v2_irfft_mul_call_t,
                                 _v2_stage_call, fused_stage_inv_otf)

        v2 = self._v2
        lead = x.shape[:-3]
        nz, ny, nx = self.shape
        use_t = v2.get("t") and lead == ()
        re, im = self._fwd_packed_v2(x, ratio_num)
        rr, ii = fused_stage_inv_otf(re, im, otf[0], otf[1], v2["xmats"],
                                     conj, interpret=self._kern_interpret)
        zhi, zlo = v2["zmats"][1]
        rr3, ii3 = _v2_stage_call(rr.reshape((-1, nz, nx)),
                                  ii.reshape((-1, nz, nx)), zhi, zlo,
                                  False, interpret=self._kern_interpret)
        ihi, ilo = v2["rmats"][1]
        if use_t:
            # rr3 is (kp, z, x) — exactly the layout the 't' irfft reads;
            # the swapaxes pair around the z-stage is gone
            if mul_abs is not None:
                out = _v2_irfft_mul_call_t(rr3, ii3,
                                           mul_abs.reshape((-1, ny, nx)),
                                           ihi, ilo, ny,
                                           interpret=self._kern_interpret)
            else:
                out = _v2_irfft_call_t(rr3, ii3, ihi, ilo, ny,
                                       interpret=self._kern_interpret)
            return out.reshape(lead + (nz, ny, nx))
        rr = rr3.reshape(lead + (v2["kp"], nz, nx))
        ii = ii3.reshape(lead + (v2["kp"], nz, nx))
        rr = jnp.swapaxes(rr, -3, -2)     # (..., z, kp, x)
        ii = jnp.swapaxes(ii, -3, -2)
        if mul_abs is not None:
            out = _v2_irfft_mul_call(rr.reshape((-1, v2["kp"], nx)),
                                     ii.reshape((-1, v2["kp"], nx)),
                                     mul_abs.reshape((-1, ny, nx)),
                                     ihi, ilo, ny,
                                     interpret=self._kern_interpret)
        else:
            out = _v2_irfft_call(rr.reshape((-1, v2["kp"], nx)),
                                 ii.reshape((-1, v2["kp"], nx)),
                                 ihi, ilo, ny,
                                 interpret=self._kern_interpret)
        return out.reshape(lead + (nz, ny, nx))

    def _fwd_packed(self, x: jnp.ndarray):
        """rfftn with the spectrum left in the internal (Z, kxp, Y) layout
        (Z/Y in radix-permuted frequency order when a radix split or the
        fused kernel applies — consistent between :meth:`otf_packed` and
        :meth:`convolve`; kxp = sublane-padded half spectrum, the padded
        frequencies are exactly zero)."""
        both = self._mm_last(x, self._fx_p)        # (..., z, y, 2*kxp)
        re, im = both[..., :self.kxp], both[..., self.kxp:]
        re = jnp.moveaxis(re, -3, -1)               # (..., y, k, z)
        im = jnp.moveaxis(im, -3, -1)
        re, im = self._stage(re, im, self._fz, self._fz_rad, True)
        re = jnp.swapaxes(re, -3, -1)               # (..., Z, k, y)
        im = jnp.swapaxes(im, -3, -1)
        return self._stage(re, im, self._fy, self._fy_rad, True)

    def otf_packed(self, psf_rolled: jnp.ndarray):
        """OTF in the internal layout for :meth:`convolve` — always f32:
        an OTF rounding error is systematic across RL iterations (it does
        not average out like the per-volume storage rounding)."""
        if self._v2 is not None:
            return self._fwd_packed_v2(psf_rolled)
        re, im = self._fwd_packed(psf_rolled)
        return re.astype(jnp.float32), im.astype(jnp.float32)

    def convolve(self, x: jnp.ndarray, otf, conj: bool = False,
                 ratio_num=None, mul_abs=None) -> jnp.ndarray:
        """Circular convolution irfftn(rfftn(x) * OTF); `otf` comes from
        :meth:`otf_packed`."""
        if self._v2 is not None:
            return self._convolve_v2(x, otf, conj, ratio_num, mul_abs)
        if ratio_num is not None:
            eps = jnp.float32(np.finfo(np.float32).eps)
            x = ratio_num / jnp.maximum(x, eps)
        re, im = self._fwd_packed(x)
        f32 = jnp.float32
        kern_y = self._kern.get(re.shape[-1])
        if kern_y is not None:
            # OTF product + inverse-y stage in one VMEM pass: the spectral
            # product never touches HBM
            from .pallas_fft import fused_stage_inv_otf

            rr, ii = fused_stage_inv_otf(re, im, otf[0], otf[1], kern_y,
                                         conj,
                                         interpret=self._kern_interpret)
        else:
            otf_re, otf_im = (o.astype(f32) for o in otf)
            if conj:
                otf_im = -otf_im
            re = re.astype(f32)
            im = im.astype(f32)
            # the spectral product runs in f32 on the VPU (it fuses into
            # the surrounding stages — no extra HBM traffic) and rounds
            # once back to the storage dtype inside _cplx_last
            rr = re * otf_re - im * otf_im
            ii = re * otf_im + im * otf_re
            rr, ii = self._stage(rr, ii, self._iy, self._iy_rad, False)
        rr = jnp.swapaxes(rr, -3, -1)                # (..., y, k, Z)
        ii = jnp.swapaxes(ii, -3, -1)
        rr, ii = self._stage(rr, ii, self._iz, self._iz_rad, False)
        rr = jnp.moveaxis(rr, -1, -3)                # (..., z, y, kxp)
        ii = jnp.moveaxis(ii, -1, -3)
        out = self._mm_last(jnp.concatenate([rr, ii], axis=-1), self._ix_p,
                            out_dtype=jnp.float32)
        if mul_abs is not None:  # v1 fallback of the fused RL update
            out = jnp.abs(mul_abs * out)
        return out

    def otf(self, psf_rolled: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Forward transform of an origin-centered padded PSF (canonical
        (z, y, kx) layout — for convolve use :meth:`otf_packed`)."""
        return self.rfftn(psf_rolled)


@partial(jax.jit, static_argnames=("shape",))
def _selftest_roundtrip(x, shape):
    plan = MatmulFFT3(shape)
    return plan.irfftn(*plan.rfftn(x))
