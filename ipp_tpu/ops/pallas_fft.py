"""Pallas fused Karatsuba complex-DFT stage for the MXU FFT (experiment).

Hypothesis: the per-axis complex products of the matmul-DFT convolution
(ops/mxu_fft.py) are bandwidth-bound, so fusing the three Karatsuba
matmuls in one VMEM-resident kernel should cut the stage's HBM traffic
in half.

MEASURED on a v5e chip (264^3 stage, 30-rep loop): XLA Karatsuba at HIGH
precision 1.83 ms, this kernel 1.87 ms with ~1e-3 relative error (Pallas
`jnp.dot` of f32 operands runs a single bf16 pass on the MXU — DEFAULT-
precision accuracy).  Conclusion: XLA already fuses the stage IO; the
transform is MXU-flops-bound at HIGH precision, and this kernel is
strictly dominated (DEFAULT accuracy at HIGH cost).  Kept as an opt-in
experiment (IPP_TPU_FFT_FUSED=1) and as the repo's Pallas matmul-stage
reference; the production path stays on the XLA decomposition.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_cplx_matmul"]

_TM = 512  # rows per grid step: (512, 264+) f32 tiles fit VMEM comfortably


def _compiler_params(pltpu):
    """Scoped-VMEM cap for every pallas_call in this module.

    Mosaic's DEFAULT cap is 16 MB of scoped VMEM, and legal big-block
    kernels exceed it at compile time: the ny=512 ratio-rfft (two
    (8, 512, 128) f32 input blocks + the kp-major output stack) needs
    16.9 MB and failed with "vmem stack oom" on a (256, 512, 512) RL
    decon block (round-4 block-size sweep).  v5e has 128 MB of VMEM;
    a uniform generous cap makes every block shape the BlockSpecs
    already describe legal, without changing kernels that fit the
    default (the cap is a ceiling the compiler checks, not a request).
    """
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


@partial(jax.jit, static_argnames=("interpret",))
def _fused_call(re2, im2, fr, fi, fri, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = re2.shape
    n = fr.shape[1]

    def kernel(re_ref, im_ref, fr_ref, fi_ref, fri_ref, rr_ref, ii_ref):
        re = re_ref[:]
        im = im_ref[:]
        t1 = jnp.dot(re, fr_ref[:], preferred_element_type=jnp.float32)
        t2 = jnp.dot(im, fi_ref[:], preferred_element_type=jnp.float32)
        t3 = jnp.dot(re + im, fri_ref[:],
                     preferred_element_type=jnp.float32)
        rr_ref[:] = t1 - t2
        ii_ref[:] = t3 - t1 - t2

    grid = (m // _TM,) if m % _TM == 0 and m >= _TM else (1,)
    tm = _TM if grid[0] > 1 else m
    return pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=_compiler_params(pltpu),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((m, n), jnp.float32),
                   jax.ShapeDtypeStruct((m, n), jnp.float32)],
        interpret=interpret,
    )(re2, im2, fr, fi, fri)


def fused_cplx_matmul(re: jnp.ndarray, im: jnp.ndarray, mats,
                      interpret: bool = False):
    """(re + i*im) @ (mr + i*mi) along the last axis, Karatsuba fused in
    one Pallas kernel.  Leading dims flatten into rows; rows pad to the
    tile height."""
    mr, mi, mri = mats
    k = re.shape[-1]
    n = mr.shape[1]
    lead = re.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    re2 = re.reshape(m, k)
    im2 = im.reshape(m, k)
    pad = (-m) % _TM if m > _TM else 0
    if pad:
        re2 = jnp.pad(re2, ((0, pad), (0, 0)))
        im2 = jnp.pad(im2, ((0, pad), (0, 0)))
    rr, ii = _fused_call(re2, im2, mr, mi, mri, interpret=interpret)
    if pad:
        rr = rr[:m]
        ii = ii[:m]
    return rr.reshape(*lead, n), ii.reshape(*lead, n)


# ---------------------------------------------------------------------------
# Fused radix-2 DIF stage kernel (production path for 256-multiple axes)
#
# One VMEM-resident pass per complex DFT stage of the packed convolve
# (mxu_fft.MatmulFFT3._stage): reads (re, im) once, computes the radix-2
# DIF butterfly on CONTIGUOUS lane halves (u_s = a +/- b, twiddles folded
# into the per-s matrices), runs the three Karatsuba products as 3-pass
# hi/lo-split bf16 matmuls (f32-grade accuracy: the MXU consumes bf16
# pairs, accumulation stays f32), and writes (rr, ii) once.  Vs the XLA
# decomposition this removes the Karatsuba intermediate traffic (t1/t2/t3
# and re+im materializations) AND halves MXU flops (contraction m = n/2,
# lane-exact at n=256) — the XLA-level radix experiments above lost those
# wins to relayouts, which a kernel avoids by construction.
# ---------------------------------------------------------------------------

def _np_hilo(M):
    """(hi, lo) bf16 split as NUMPY constants: the prep functions are
    lru_cached, and caching jnp arrays poisons the cache with tracers
    when the first call happens inside a trace (e.g. the mesh pipeline's
    shard_map) — numpy constants are always safe to embed."""
    import ml_dtypes

    M = np.asarray(M, np.float32)
    hi = M.astype(ml_dtypes.bfloat16)
    lo = (M - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


STAGE_TM = 512  # rows per grid step; all packed-path row counts divide it


@lru_cache(maxsize=16)
def prep_stage_mats(n: int):
    """((fwd_hi, fwd_lo), (inv_hi, inv_lo)): stacked (6, m, m) bf16 hi/lo
    splits of the radix-2 twiddle-folded matrices, Karatsuba-ordered
    [s0:(Mr, Mi, Mr+Mi), s1:(...)]."""
    from .mxu_fft import _radix_fwd_mats, _radix_inv_mats

    out = []
    for fwd in (True, False):
        Mr, Mi = _radix_fwd_mats(n, 2) if fwd else _radix_inv_mats(n, 2)
        mats = []
        for s in range(2):
            mats += [Mr[s], Mi[s], Mr[s] + Mi[s]]
        out.append(_np_hilo(np.stack(mats)))
    return tuple(out)


def _mm3(x, mhi_ref, mlo_ref, idx):
    """3-pass hi/lo-split matmul: f32-grade x @ M on bf16 MXU passes."""
    f32 = jnp.float32
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(f32)).astype(jnp.bfloat16)
    mh = mhi_ref[idx]
    ml = mlo_ref[idx]
    return (jnp.dot(xh, mh, preferred_element_type=f32)
            + jnp.dot(xh, ml, preferred_element_type=f32)
            + jnp.dot(xl, mh, preferred_element_type=f32))


def _stage_fwd_kernel(re_ref, im_ref, mhi_ref, mlo_ref, rr_ref, ii_ref):
    m = re_ref.shape[-1] // 2
    re = re_ref[:]
    im = im_ref[:]
    pairs = ((re[:, :m] + re[:, m:], im[:, :m] + im[:, m:]),
             (re[:, :m] - re[:, m:], im[:, :m] - im[:, m:]))
    for s, (ur, ui) in enumerate(pairs):
        t1 = _mm3(ur, mhi_ref, mlo_ref, 3 * s)
        t2 = _mm3(ui, mhi_ref, mlo_ref, 3 * s + 1)
        t3 = _mm3(ur + ui, mhi_ref, mlo_ref, 3 * s + 2)
        rr_ref[:, s * m:(s + 1) * m] = t1 - t2
        ii_ref[:, s * m:(s + 1) * m] = t3 - t1 - t2


def _stage_inv_kernel(re_ref, im_ref, mhi_ref, mlo_ref, rr_ref, ii_ref):
    m = re_ref.shape[-1] // 2
    vs = []
    for s in range(2):
        xr = re_ref[:, s * m:(s + 1) * m]
        xi = im_ref[:, s * m:(s + 1) * m]
        t1 = _mm3(xr, mhi_ref, mlo_ref, 3 * s)
        t2 = _mm3(xi, mhi_ref, mlo_ref, 3 * s + 1)
        t3 = _mm3(xr + xi, mhi_ref, mlo_ref, 3 * s + 2)
        vs.append((t1 - t2, t3 - t1 - t2))
    (r0, i0), (r1, i1) = vs
    rr_ref[:, :m] = (r0 + r1) * 0.5
    rr_ref[:, m:] = (r0 - r1) * 0.5
    ii_ref[:, :m] = (i0 + i1) * 0.5
    ii_ref[:, m:] = (i0 - i1) * 0.5


def _make_stage_inv_otf_kernel(conj: bool):
    """Inverse stage with the OTF product fused at the input: computes
    (re + i*im) * (otf_re +/- i*otf_im) in VMEM, then the inverse stage —
    the spectral product is never materialized in HBM."""
    sign = -1.0 if conj else 1.0

    def kernel(re_ref, im_ref, or_ref, oi_ref, mhi_ref, mlo_ref,
               rr_ref, ii_ref):
        m = re_ref.shape[-1] // 2
        a_re = re_ref[:]
        a_im = im_ref[:]
        o_re = or_ref[:]
        o_im = oi_ref[:] * sign
        re = a_re * o_re - a_im * o_im
        im = a_re * o_im + a_im * o_re
        vs = []
        for s in range(2):
            xr = re[:, s * m:(s + 1) * m]
            xi = im[:, s * m:(s + 1) * m]
            t1 = _mm3(xr, mhi_ref, mlo_ref, 3 * s)
            t2 = _mm3(xi, mhi_ref, mlo_ref, 3 * s + 1)
            t3 = _mm3(xr + xi, mhi_ref, mlo_ref, 3 * s + 2)
            vs.append((t1 - t2, t3 - t1 - t2))
        (r0, i0), (r1, i1) = vs
        rr_ref[:, :m] = (r0 + r1) * 0.5
        rr_ref[:, m:] = (r0 - r1) * 0.5
        ii_ref[:, :m] = (i0 + i1) * 0.5
        ii_ref[:, m:] = (i0 - i1) * 0.5

    return kernel


@partial(jax.jit, static_argnames=("forward", "interpret"))
def _fused_stage_call(re2, im2, mhi, mlo, forward, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, n = re2.shape
    m = n // 2
    grid = (R // STAGE_TM,)
    mat_spec = pl.BlockSpec((6, m, m), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((STAGE_TM, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _stage_fwd_kernel if forward else _stage_inv_kernel,
        grid=grid,
        compiler_params=_compiler_params(pltpu),
        in_specs=[row_spec, row_spec, mat_spec, mat_spec],
        out_specs=[row_spec, row_spec],
        out_shape=[jax.ShapeDtypeStruct((R, n), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * R * m * m * 18,
            bytes_accessed=4 * R * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(re2, im2, mhi, mlo)


def fused_stage(re, im, kern, forward, interpret=False):
    """Apply the fused radix-2 stage along the last axis of (..., n)
    arrays; spectrum order matches mxu_fft's radix-2 convention
    ([s*m + k] = X[2k + s]).  Leading dims flatten as a pure view (the
    caller guarantees kxp sublane alignment and row divisibility)."""
    shape = re.shape
    n = shape[-1]
    R = int(np.prod(shape[:-1]))
    assert R % STAGE_TM == 0, (shape, STAGE_TM)
    mats_hi, mats_lo = kern[0 if forward else 1]
    rr, ii = _fused_stage_call(re.reshape(R, n), im.reshape(R, n),
                               mats_hi, mats_lo, forward,
                               interpret=interpret)
    return rr.reshape(shape), ii.reshape(shape)


@partial(jax.jit, static_argnames=("conj", "interpret"))
def _fused_stage_otf_call(re2, im2, or2, oi2, mhi, mlo, conj,
                          interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, n = re2.shape
    m = n // 2
    grid = (R // STAGE_TM,)
    mat_spec = pl.BlockSpec((6, m, m), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((STAGE_TM, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    # batched volumes share one OTF: wrap its row blocks instead of
    # materializing a broadcast copy in HBM
    n_otf_blocks = or2.shape[0] // STAGE_TM
    otf_spec = pl.BlockSpec((STAGE_TM, n), lambda i: (i % n_otf_blocks, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_stage_inv_otf_kernel(conj),
        grid=grid,
        compiler_params=_compiler_params(pltpu),
        in_specs=[row_spec, row_spec, otf_spec, otf_spec,
                  mat_spec, mat_spec],
        out_specs=[row_spec, row_spec],
        out_shape=[jax.ShapeDtypeStruct((R, n), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * R * m * m * 18 + 8 * R * n,
            bytes_accessed=6 * R * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(re2, im2, or2, oi2, mhi, mlo)


def fused_stage_inv_otf(re, im, otf_re, otf_im, kern, conj,
                        interpret=False):
    """OTF product + inverse radix-2 stage in one VMEM pass (the spectral
    product never touches HBM).  `otf_*` broadcast over any leading batch
    dims of `re`/`im`."""
    shape = re.shape
    n = shape[-1]
    R = int(np.prod(shape[:-1]))
    R_o = int(np.prod(otf_re.shape[:-1]))
    assert R % STAGE_TM == 0 and R % R_o == 0, (shape, otf_re.shape)
    mats_hi, mats_lo = kern[1]
    rr, ii = _fused_stage_otf_call(
        re.reshape(R, n), im.reshape(R, n),
        otf_re.reshape(R_o, n), otf_im.reshape(R_o, n),
        mats_hi, mats_lo, bool(conj), interpret=interpret)
    return rr.reshape(shape), ii.reshape(shape)


# ---------------------------------------------------------------------------
# v2: sublane-contraction stage kernels for the near-transpose-free
# convolve walk (mxu_fft.MatmulFFT3.convolve, IPP_TPU_FFT_V2 path)
#
# The v1 path's remaining cost is 8 XLA transposes per convolve (~11 ms
# of 43.8 at 256^3): each lane-form stage needs its axis in lanes.  The
# MXU's rhs contracts over SUBLANES natively, so a kernel that loops an
# 8-deep major chunk and runs dot(M, X[i]) transforms the SUBLANE axis
# with no relayout at all.  The walk (axes (z, y, x), x = lanes
# throughout, real-domain width — the half-spectrum dim never reaches
# the lane position):
#
#   (z, y, x)   --K1 fwd (contract y, dense rfft fold)-->  (z, Yk, x)
#   transpose   --XLA-->                                   (Yk, z, x)
#   (Yk, z, x)  --K2 fwd (contract z, radix-2)-->          (Yk, Z, x)
#   (Yk, Z, x)  --fused_stage (lanes x, radix-2)-->        (Yk, Z, X)
#   * OTF *     --fused_stage_inv_otf-->                   (Yk, Z, x)
#   (Yk, Z, x)  --K2 inv-->                                (Yk, z, x)
#   transpose   --XLA-->                                   (z, Yk, x)
#   (z, Yk, x)  --K1 inv (Hermitian fold)-->               (z, y, x)
#
# ONE transpose pair survives (4 array transposes vs 8), every stage is
# a fused one-pass kernel, and the y-fold matrices live in the sublane
# dim (272 rows) so the v1 x-matmuls' 272->384 lane padding disappears.
# ---------------------------------------------------------------------------


def _split3(x):
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    return xh, xl


def _mm3_lhs(mh, ml, x):
    """3-pass hi/lo matmul with the constant matrix as LHS:
    M @ x, contraction over x's sublanes (MXU-native)."""
    f32 = jnp.float32
    xh, xl = _split3(x)
    return (jnp.dot(mh, xh, preferred_element_type=f32)
            + jnp.dot(ml, xh, preferred_element_type=f32)
            + jnp.dot(mh, xl, preferred_element_type=f32))


@lru_cache(maxsize=16)
def prep_v2_rfft_mats(n: int, kp: int):
    """((fwd_hi, fwd_lo), (inv_hi, inv_lo)) for the sublane y-rfft:
    fwd (2*kp, n) stacked [re-rows; im-rows] (zero rows pad kx -> kp);
    inv (n, 2*kp) Hermitian fold consuming [re; im]."""
    from .mxu_fft import _irdft_mats, _rdft_mats

    kx = n // 2 + 1
    fr, fi = _rdft_mats(n)          # (n, kx) each
    fwd = np.zeros((2 * kp, n), np.float32)
    fwd[:kx] = fr.T
    fwd[kp:kp + kx] = fi.T
    ar, ai = _irdft_mats(n)          # (kx, n) each, fold + 1/n included
    inv = np.zeros((n, 2 * kp), np.float32)
    inv[:, :kx] = ar.T
    inv[:, kp:kp + kx] = -ai.T
    return (_np_hilo(fwd), _np_hilo(inv))


@lru_cache(maxsize=16)
def prep_v2_stage_mats(n: int):
    """Transposed radix-2 stage mats for the sublane form (M_s^T so the
    constants sit as LHS), Karatsuba-ordered like prep_stage_mats."""
    from .mxu_fft import _radix_fwd_mats, _radix_inv_mats

    out = []
    for fwd in (True, False):
        Mr, Mi = _radix_fwd_mats(n, 2) if fwd else _radix_inv_mats(n, 2)
        mats = []
        for s in range(2):
            mats += [Mr[s].T, Mi[s].T, (Mr[s] + Mi[s]).T]
        out.append(_np_hilo(np.ascontiguousarray(np.stack(mats))))
    return tuple(out)


_V2_B = 8      # major-chunk depth per grid step
_V2_TX = 128   # x lanes per grid step


def _v2_rfft_kernel(x_ref, mhi_ref, mlo_ref, re_ref, im_ref):
    kp2 = mhi_ref.shape[0]
    kp = kp2 // 2
    res, ims = [], []
    for i in range(_V2_B):
        full = _mm3_lhs(mhi_ref[:], mlo_ref[:], x_ref[i])  # (2kp, TX)
        res.append(full[:kp])
        ims.append(full[kp:])
    re_ref[:] = jnp.stack(res, axis=0)
    im_ref[:] = jnp.stack(ims, axis=0)


def _v2_irfft_kernel(re_ref, im_ref, mhi_ref, mlo_ref, out_ref):
    outs = []
    for i in range(_V2_B):
        both = jnp.concatenate([re_ref[i], im_ref[i]], axis=0)  # (2kp, TX)
        outs.append(_mm3_lhs(mhi_ref[:], mlo_ref[:], both))     # (n, TX)
    out_ref[:] = jnp.stack(outs, axis=0)


def _v2_stage_fwd_kernel(re_ref, im_ref, mhi_ref, mlo_ref,
                         rr_ref, ii_ref):
    m = re_ref.shape[1] // 2
    rrs, iis = [], []
    for i in range(_V2_B):
        re = re_ref[i]
        im = im_ref[i]
        pairs = ((re[:m] + re[m:], im[:m] + im[m:]),
                 (re[:m] - re[m:], im[:m] - im[m:]))
        rs, is_ = [], []
        for s, (ur, ui) in enumerate(pairs):
            t1 = _mm3_lhs(mhi_ref[3 * s], mlo_ref[3 * s], ur)
            t2 = _mm3_lhs(mhi_ref[3 * s + 1], mlo_ref[3 * s + 1], ui)
            t3 = _mm3_lhs(mhi_ref[3 * s + 2], mlo_ref[3 * s + 2], ur + ui)
            rs.append(t1 - t2)
            is_.append(t3 - t1 - t2)
        rrs.append(jnp.concatenate(rs, axis=0))
        iis.append(jnp.concatenate(is_, axis=0))
    rr_ref[:] = jnp.stack(rrs, axis=0)
    ii_ref[:] = jnp.stack(iis, axis=0)


def _v2_stage_inv_kernel(re_ref, im_ref, mhi_ref, mlo_ref,
                         rr_ref, ii_ref):
    m = re_ref.shape[1] // 2
    rrs, iis = [], []
    for i in range(_V2_B):
        re = re_ref[i]
        im = im_ref[i]
        vs = []
        for s in range(2):
            xr = re[s * m:(s + 1) * m]
            xi = im[s * m:(s + 1) * m]
            t1 = _mm3_lhs(mhi_ref[3 * s], mlo_ref[3 * s], xr)
            t2 = _mm3_lhs(mhi_ref[3 * s + 1], mlo_ref[3 * s + 1], xi)
            t3 = _mm3_lhs(mhi_ref[3 * s + 2], mlo_ref[3 * s + 2], xr + xi)
            vs.append((t1 - t2, t3 - t1 - t2))
        (r0, i0), (r1, i1) = vs
        rrs.append(jnp.concatenate([(r0 + r1) * 0.5, (r0 - r1) * 0.5],
                                   axis=0))
        iis.append(jnp.concatenate([(i0 + i1) * 0.5, (i0 - i1) * 0.5],
                                   axis=0))
    rr_ref[:] = jnp.stack(rrs, axis=0)
    ii_ref[:] = jnp.stack(iis, axis=0)


@partial(jax.jit, static_argnames=("interpret",))
def _v2_rfft_call(x, mhi, mlo, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A, n, X = x.shape
    kp = mhi.shape[0] // 2
    grid = (A // _V2_B, X // _V2_TX)

    def blk(h):
        return pl.BlockSpec((_V2_B, h, _V2_TX), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    mat = pl.BlockSpec(mhi.shape, lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _v2_rfft_kernel, grid=grid,
        compiler_params=_compiler_params(pltpu),
        in_specs=[blk(n), mat, mat],
        out_specs=[blk(kp), blk(kp)],
        out_shape=[jax.ShapeDtypeStruct((A, kp, X), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * A * X * n * 2 * kp * 3,
            bytes_accessed=A * X * (n + 2 * kp) * 4, transcendentals=0),
        interpret=interpret)(x, mhi, mlo)


@partial(jax.jit, static_argnames=("n", "interpret"))
def _v2_irfft_call(re, im, mhi, mlo, n, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A, kp, X = re.shape
    grid = (A // _V2_B, X // _V2_TX)

    def blk(h):
        return pl.BlockSpec((_V2_B, h, _V2_TX), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    mat = pl.BlockSpec(mhi.shape, lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _v2_irfft_kernel, grid=grid,
        compiler_params=_compiler_params(pltpu),
        in_specs=[blk(kp), blk(kp), mat, mat],
        out_specs=blk(n),
        out_shape=jax.ShapeDtypeStruct((A, n, X), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * A * X * n * 2 * kp * 3,
            bytes_accessed=A * X * (n + 2 * kp) * 4, transcendentals=0),
        interpret=interpret)(re, im, mhi, mlo)


@partial(jax.jit, static_argnames=("forward", "interpret"))
def _v2_stage_call(re, im, mhi, mlo, forward, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A, n, X = re.shape
    grid = (A // _V2_B, X // _V2_TX)

    def blk(h):
        return pl.BlockSpec((_V2_B, h, _V2_TX), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    mat = pl.BlockSpec(mhi.shape, lambda i, j: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _v2_stage_fwd_kernel if forward else _v2_stage_inv_kernel,
        grid=grid,
        compiler_params=_compiler_params(pltpu),
        in_specs=[blk(n), blk(n), mat, mat],
        out_specs=[blk(n), blk(n)],
        out_shape=[jax.ShapeDtypeStruct((A, n, X), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * A * X * n * (n // 2) * 9,
            bytes_accessed=4 * A * n * X * 4, transcendentals=0),
        interpret=interpret)(re, im, mhi, mlo)


# --- axis-1-stacking ("t") variants: the y-rfft writes its output with
# kp MAJOR ((kp, z, x) instead of (z, kp, x)) and the y-irfft reads it
# back, so the XLA swapaxes pair around the z-stage disappears — the last
# transposes of the v2 walk (docs/STATUS.md "Known gaps": needs
# sublane-strided VMEM writes to be cheap; measured on hardware either
# way, see STATUS).  Unbatched (lead == ()) only: with a batch dim the
# kp-major layout would interleave kp ahead of the batch axis.


# B=8 is the floor: Mosaic requires the second-minor block dim to divide
# by 8 (or equal the array dim), so a contiguous-write B=1 (kp, 1, TX)
# out block cannot lower — the sublane-strided stack is unavoidable in
# this layout (measured anyway: the t-walk still nets +7 Mvox/s).
_V2_BT = _V2_B


def _v2_rfft_kernel_t(x_ref, mhi_ref, mlo_ref, re_ref, im_ref):
    kp = mhi_ref.shape[0] // 2
    res, ims = [], []
    for i in range(_V2_BT):
        full = _mm3_lhs(mhi_ref[:], mlo_ref[:], x_ref[i])  # (2kp, TX)
        res.append(full[:kp])
        ims.append(full[kp:])
    re_ref[:] = jnp.stack(res, axis=1)   # (kp, B, TX): sublane-strided
    im_ref[:] = jnp.stack(ims, axis=1)


def _v2_rfft_ratio_kernel_t(num_ref, den_ref, mhi_ref, mlo_ref,
                            re_ref, im_ref):
    kp = mhi_ref.shape[0] // 2
    eps = jnp.float32(np.finfo(np.float32).eps)
    res, ims = [], []
    for i in range(_V2_BT):
        x = num_ref[i] / jnp.maximum(den_ref[i], eps)
        full = _mm3_lhs(mhi_ref[:], mlo_ref[:], x)
        res.append(full[:kp])
        ims.append(full[kp:])
    re_ref[:] = jnp.stack(res, axis=1)
    im_ref[:] = jnp.stack(ims, axis=1)


def _v2_irfft_kernel_t(re_ref, im_ref, mhi_ref, mlo_ref, out_ref):
    outs = []
    for i in range(_V2_BT):
        both = jnp.concatenate([re_ref[:, i, :], im_ref[:, i, :]], axis=0)
        outs.append(_mm3_lhs(mhi_ref[:], mlo_ref[:], both))
    out_ref[:] = jnp.stack(outs, axis=0)


def _v2_irfft_mul_kernel_t(re_ref, im_ref, mul_ref, mhi_ref, mlo_ref,
                           out_ref):
    outs = []
    for i in range(_V2_BT):
        both = jnp.concatenate([re_ref[:, i, :], im_ref[:, i, :]], axis=0)
        y = _mm3_lhs(mhi_ref[:], mlo_ref[:], both)
        outs.append(jnp.abs(mul_ref[i] * y))
    out_ref[:] = jnp.stack(outs, axis=0)


def _v2_blk_t(kp):
    """(kp, B, TX) block at (0, i, j) of a (kp, A, X) array."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec((kp, _V2_BT, _V2_TX), lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=("interpret",))
def _v2_rfft_call_t(x, mhi, mlo, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A, n, X = x.shape
    kp = mhi.shape[0] // 2
    grid = (A // _V2_BT, X // _V2_TX)

    def blk(h):
        return pl.BlockSpec((_V2_BT, h, _V2_TX), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    mat = pl.BlockSpec(mhi.shape, lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _v2_rfft_kernel_t, grid=grid,
        compiler_params=_compiler_params(pltpu),
        in_specs=[blk(n), mat, mat],
        out_specs=[_v2_blk_t(kp)] * 2,
        out_shape=[jax.ShapeDtypeStruct((kp, A, X), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * A * X * n * 2 * kp * 3,
            bytes_accessed=A * X * (n + 2 * kp) * 4, transcendentals=0),
        interpret=interpret)(x, mhi, mlo)


@partial(jax.jit, static_argnames=("interpret",))
def _v2_rfft_ratio_call_t(num, den, mhi, mlo, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A, n, X = num.shape
    kp = mhi.shape[0] // 2
    grid = (A // _V2_BT, X // _V2_TX)

    def blk(h):
        return pl.BlockSpec((_V2_BT, h, _V2_TX), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    mat = pl.BlockSpec(mhi.shape, lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _v2_rfft_ratio_kernel_t, grid=grid,
        compiler_params=_compiler_params(pltpu),
        in_specs=[blk(n), blk(n), mat, mat],
        out_specs=[_v2_blk_t(kp)] * 2,
        out_shape=[jax.ShapeDtypeStruct((kp, A, X), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * A * X * n * 2 * kp * 3,
            bytes_accessed=A * X * (2 * n + 2 * kp) * 4,
            transcendentals=0),
        interpret=interpret)(num, den, mhi, mlo)


@partial(jax.jit, static_argnames=("n", "interpret"))
def _v2_irfft_call_t(re, im, mhi, mlo, n, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kp, A, X = re.shape
    grid = (A // _V2_BT, X // _V2_TX)

    def blk(h):
        return pl.BlockSpec((_V2_BT, h, _V2_TX), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    mat = pl.BlockSpec(mhi.shape, lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _v2_irfft_kernel_t, grid=grid,
        compiler_params=_compiler_params(pltpu),
        in_specs=[_v2_blk_t(kp)] * 2 + [mat, mat],
        out_specs=blk(n),
        out_shape=jax.ShapeDtypeStruct((A, n, X), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * A * X * n * 2 * kp * 3,
            bytes_accessed=A * X * (n + 2 * kp) * 4, transcendentals=0),
        interpret=interpret)(re, im, mhi, mlo)


@partial(jax.jit, static_argnames=("n", "interpret"))
def _v2_irfft_mul_call_t(re, im, mul, mhi, mlo, n, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kp, A, X = re.shape
    grid = (A // _V2_BT, X // _V2_TX)

    def blk(h):
        return pl.BlockSpec((_V2_BT, h, _V2_TX), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    mat = pl.BlockSpec(mhi.shape, lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _v2_irfft_mul_kernel_t, grid=grid,
        compiler_params=_compiler_params(pltpu),
        in_specs=[_v2_blk_t(kp)] * 2 + [blk(n), mat, mat],
        out_specs=blk(n),
        out_shape=jax.ShapeDtypeStruct((A, n, X), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * A * X * n * 2 * kp * 3,
            bytes_accessed=A * X * (2 * n + 2 * kp) * 4,
            transcendentals=0),
        interpret=interpret)(re, im, mul, mhi, mlo)


def _v2_rfft_ratio_kernel(num_ref, den_ref, mhi_ref, mlo_ref,
                          re_ref, im_ref):
    """y-rfft with the Richardson-Lucy ratio fused at the input:
    x = num / max(den, eps) never touches HBM (den is the blur
    prediction, num the observation — decon.m:169's ratio)."""
    kp2 = mhi_ref.shape[0]
    kp = kp2 // 2
    eps = jnp.float32(np.finfo(np.float32).eps)
    res, ims = [], []
    for i in range(_V2_B):
        x = num_ref[i] / jnp.maximum(den_ref[i], eps)
        full = _mm3_lhs(mhi_ref[:], mlo_ref[:], x)
        res.append(full[:kp])
        ims.append(full[kp:])
    re_ref[:] = jnp.stack(res, axis=0)
    im_ref[:] = jnp.stack(ims, axis=0)


@partial(jax.jit, static_argnames=("interpret",))
def _v2_rfft_ratio_call(num, den, mhi, mlo, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A, n, X = num.shape
    kp = mhi.shape[0] // 2
    grid = (A // _V2_B, X // _V2_TX)

    def blk(h):
        return pl.BlockSpec((_V2_B, h, _V2_TX), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    mat = pl.BlockSpec(mhi.shape, lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _v2_rfft_ratio_kernel, grid=grid,
        compiler_params=_compiler_params(pltpu),
        in_specs=[blk(n), blk(n), mat, mat],
        out_specs=[blk(kp), blk(kp)],
        out_shape=[jax.ShapeDtypeStruct((A, kp, X), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * A * X * n * 2 * kp * 3,
            bytes_accessed=A * X * (2 * n + 2 * kp) * 4,
            transcendentals=0),
        interpret=interpret)(num, den, mhi, mlo)


def _v2_irfft_mul_kernel(re_ref, im_ref, mul_ref, mhi_ref, mlo_ref,
                         out_ref):
    """y-irfft with the RL multiplicative update fused at the output:
    out = |mul * irfft(...)| (decon.m:171's bl .* buf + abs)."""
    outs = []
    for i in range(_V2_B):
        both = jnp.concatenate([re_ref[i], im_ref[i]], axis=0)
        y = _mm3_lhs(mhi_ref[:], mlo_ref[:], both)
        outs.append(jnp.abs(mul_ref[i] * y))
    out_ref[:] = jnp.stack(outs, axis=0)


@partial(jax.jit, static_argnames=("n", "interpret"))
def _v2_irfft_mul_call(re, im, mul, mhi, mlo, n, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A, kp, X = re.shape
    grid = (A // _V2_B, X // _V2_TX)

    def blk(h):
        return pl.BlockSpec((_V2_B, h, _V2_TX), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    mat = pl.BlockSpec(mhi.shape, lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _v2_irfft_mul_kernel, grid=grid,
        compiler_params=_compiler_params(pltpu),
        in_specs=[blk(kp), blk(kp), blk(n), mat, mat],
        out_specs=blk(n),
        out_shape=jax.ShapeDtypeStruct((A, n, X), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * A * X * n * 2 * kp * 3,
            bytes_accessed=A * X * (2 * n + 2 * kp) * 4,
            transcendentals=0),
        interpret=interpret)(re, im, mul, mhi, mlo)
