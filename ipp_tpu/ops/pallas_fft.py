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

from functools import partial

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
