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
        M = jnp.asarray(np.stack(mats), jnp.float32)
        hi = M.astype(jnp.bfloat16)
        lo = (M - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out.append((hi, lo))
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
