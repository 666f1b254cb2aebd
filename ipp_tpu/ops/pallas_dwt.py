"""Pallas TPU kernel: fused single-level 1D DWT analysis (polyphase form).

The destripe hot loop runs wavedec2/waverec2 on every tile
(ipp_tpu/ops/wavelets.py lowers each level to two strided XLA convolutions
per axis).  This kernel fuses the lowpass and highpass analysis into one
VMEM pass, in polyphase form: the circularly-extended signal is split into
even/odd phases outside the kernel (Mosaic has no stride-2 vector slices),
and inside the kernel both subbands accumulate over contiguous slices:

    cA[i] = sum_m lo[2m] * even[i+m] + lo[2m+1] * odd[i+m]
    cD[i] = sum_m hi[2m] * even[i+m] + hi[2m+1] * odd[i+m]

One input read produces both subbands; taps unrolled on the VPU (filter
lengths 2..40).  Enabled via IPP_TPU_PALLAS_DWT=1 (wavelets._dwt_last);
equivalence against the conv path is tested in interpret mode on CPU and
compiled on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dwt_analysis_pallas"]


def _dwt_kernel(even_ref, odd_ref, ca_ref, cd_ref, *, lo_taps, hi_taps):
    """even/odd: (rows, n//2 + L//2) phase-split rows; outputs (rows, n//2)."""
    ev = even_ref[...].astype(jnp.float32)
    od = odd_ref[...].astype(jnp.float32)
    rows, ext_half = ev.shape
    half_l = len(lo_taps) // 2
    m_out = ext_half - half_l
    ca = jnp.zeros((rows, m_out), jnp.float32)
    cd = jnp.zeros((rows, m_out), jnp.float32)
    for m in range(half_l):
        seg_e = jax.lax.slice(ev, (0, m), (rows, m + m_out))
        seg_o = jax.lax.slice(od, (0, m), (rows, m + m_out))
        ca = ca + np.float32(lo_taps[2 * m]) * seg_e \
                + np.float32(lo_taps[2 * m + 1]) * seg_o
        cd = cd + np.float32(hi_taps[2 * m]) * seg_e \
                + np.float32(hi_taps[2 * m + 1]) * seg_o
    ca_ref[...] = ca.astype(ca_ref.dtype)
    cd_ref[...] = cd.astype(cd_ref.dtype)


def dwt_analysis_pallas(x: jnp.ndarray, rec_lo: np.ndarray,
                        rec_hi: np.ndarray, rows_per_block: int = 128,
                        interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-level circular DWT along the last axis of (..., n), n even.

    Returns (cA, cD) of shape (..., n//2), numerically identical to
    wavelets._dwt_last (same circular-correlation convention)."""
    from jax.experimental import pallas as pl

    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    L = len(rec_lo)
    assert L % 2 == 0
    reps = -(-L // n)
    ext = jnp.concatenate([x] + [x] * reps, axis=-1)[..., : n + L]
    even = ext[..., 0::2]   # (..., (n+L)//2) — host-side stride-2 is fine
    odd = ext[..., 1::2]
    flat_e = even.reshape(-1, even.shape[-1])
    flat_o = odd.reshape(-1, odd.shape[-1])
    rows = flat_e.shape[0]
    pad_rows = (-rows) % rows_per_block
    if pad_rows:
        flat_e = jnp.pad(flat_e, ((0, pad_rows), (0, 0)))
        flat_o = jnp.pad(flat_o, ((0, pad_rows), (0, 0)))
    grid = (flat_e.shape[0] // rows_per_block,)
    ext_half = flat_e.shape[-1]
    m_out = ext_half - L // 2
    assert m_out == n // 2, (m_out, n)
    ca, cd = pl.pallas_call(
        partial(_dwt_kernel, lo_taps=tuple(float(v) for v in rec_lo),
                hi_taps=tuple(float(v) for v in rec_hi)),
        out_shape=(
            jax.ShapeDtypeStruct((flat_e.shape[0], n // 2), jnp.float32),
            jax.ShapeDtypeStruct((flat_e.shape[0], n // 2), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows_per_block, ext_half), lambda i: (i, 0)),
            pl.BlockSpec((rows_per_block, ext_half), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((rows_per_block, n // 2), lambda i: (i, 0)),
            pl.BlockSpec((rows_per_block, n // 2), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(flat_e, flat_o)
    if pad_rows:
        ca = ca[:rows]
        cd = cd[:rows]
    return (ca.reshape(*batch_shape, n // 2),
            cd.reshape(*batch_shape, n // 2))
