"""Periodized DWT as MXU block matmuls — the TPU-native wavelet transform.

The destripe hot loop (reference pystripe/core.py:840-940) is bound by the
DWT/iDWT conv chain: single-channel strided convolutions cannot use the
MXU and profiled as 99% of filter_subband time in round 1 (docs/STATUS.md).

This module reformulates the 1-level circular DWT along the last axis as a
*circulant block matmul*: split the axis into chunks of size C, build the
banded analysis operator as two constant matrices

    out_chunk[c] = x_chunk[c] @ A0 + head(x_chunk[c+1]) @ A1

where A0 is (C, C) mapping the in-chunk band to [cA | cD] outputs and A1 is
the thin (L-2, C) wrap-around tail (L = filter length).  Chunks ride the
MXU with contraction dims of 128-512; the tail matmul is tiny.  Synthesis
is the exact transpose structure.  Circularity falls out of jnp.roll on
the chunk axis; a single chunk (n <= C) degenerates to one dense circulant
matmul.

Numerics: float32 matmuls at HIGHEST precision — identical results to the
conv path within ~1e-6 (tests/test_wavelets.py covers equivalence).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dwt_last_mm", "idwt_last_mm"]

# HIGH (3-pass bf16) is ~3e-5 relative — invisible after the destriper's
# u16 rounding; override with IPP_TPU_DWT_PRECISION=highest if needed
import os as _os

_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}[_os.environ.get("IPP_TPU_DWT_PRECISION", "high").lower()]


def _pick_chunk(n: int, L: int) -> int:
    """Largest chunk <= 512 dividing n, at least L (so the tail spans only
    the next chunk)."""
    c = n
    while c > 512 and c % 2 == 0:
        c //= 2
    # if n has odd factors keeping c > 512, fall back to full-width chunk
    # only when it divides; c always divides n by construction
    if c < L:
        c = n  # single chunk: dense circulant
    return c


@lru_cache(maxsize=128)
def _analysis_mats(lo: Tuple[float, ...], hi: Tuple[float, ...], n: int):
    """(C, A0 (C, C), A1 (L-2, C)) for cA/cD via circular correlation at
    even shifts: cA[i] = sum_k lo[k] x[(2i+k) mod n]."""
    lo_a = np.asarray(lo, np.float64)
    hi_a = np.asarray(hi, np.float64)
    L = len(lo_a)
    C = _pick_chunk(n, L)
    half = C // 2
    A0 = np.zeros((C, C), np.float64)
    A1 = np.zeros((max(L - 2, 1), C), np.float64)
    for i in range(half):  # output index within chunk
        for k in range(L):
            j = 2 * i + k  # input index within (chunk, next-chunk head)
            if j < C:
                A0[j, i] += lo_a[k]
                A0[j, half + i] += hi_a[k]
            else:
                jj = j - C
                if C == n:  # single chunk: wrap onto itself
                    A0[jj % n, i] += lo_a[k]
                    A0[jj % n, half + i] += hi_a[k]
                else:
                    A1[jj, i] += lo_a[k]
                    A1[jj, half + i] += hi_a[k]
    return C, A0.astype(np.float32), A1.astype(np.float32)


@lru_cache(maxsize=128)
def _synthesis_mats(lo: Tuple[float, ...], hi: Tuple[float, ...], n: int):
    """Synthesis y[t] = sum_i cA[i] lo[(t-2i) mod n] + cD[i] hi[...]:
    (C, S0 (C, C), S1 (tail, C)).  Input chunks are [cA | cD] halves;
    the tail comes from the *previous* chunk's trailing coefficients."""
    lo_a = np.asarray(lo, np.float64)
    hi_a = np.asarray(hi, np.float64)
    L = len(lo_a)
    C = _pick_chunk(n, L)
    half = C // 2
    n_half = n // 2
    # number of previous-chunk coefficient columns that reach this chunk:
    # coefficient i contributes to outputs t = 2i .. 2i+L-1
    tail = max((L - 2 + 1) // 2, 1)
    S0 = np.zeros((C, C), np.float64)
    S1 = np.zeros((2 * tail, C), np.float64)
    for t in range(C):  # output index within chunk (global t0 = cC + t)
        for k in range(L):
            # contribution from coefficient i with 2i = t - k (mod n)
            j = t - k
            if j % 2:
                continue
            i = j // 2  # chunk-relative coefficient index (may be negative)
            if 0 <= i < half:
                S0[i, t] += lo_a[k]
                S0[half + i, t] += hi_a[k]
            elif i < 0:
                if C == n:  # single chunk wraps onto itself (filters may
                    ii = i % n_half  # wrap several times when L > n)
                    S0[ii, t] += lo_a[k]
                    S0[n_half + ii, t] += hi_a[k]
                else:
                    # previous chunk's trailing `tail` coefficients
                    idx = i + half - (half - tail)
                    if idx < 0:
                        raise AssertionError("tail window too small")
                    S1[idx, t] += lo_a[k]
                    S1[tail + idx, t] += hi_a[k]
    return C, tail, S0.astype(np.float32), S1.astype(np.float32)


def dwt_last_mm(x: jnp.ndarray, rec_lo: np.ndarray, rec_hi: np.ndarray):
    """1-level circular DWT along the last axis via block matmuls.
    Returns (cA, cD), each (..., n//2)."""
    n = x.shape[-1]
    C, A0, A1 = _analysis_mats(tuple(rec_lo), tuple(rec_hi), n)
    m = n // C
    half = C // 2
    xc = x.reshape(*x.shape[:-1], m, C)
    out = jnp.matmul(xc, jnp.asarray(A0), precision=_PREC)
    if m > 1:
        head = jnp.roll(xc, -1, axis=-2)[..., : A1.shape[0]]
        out = out + jnp.matmul(head, jnp.asarray(A1), precision=_PREC)
    cA = out[..., :half].reshape(*x.shape[:-1], n // 2)
    cD = out[..., half:].reshape(*x.shape[:-1], n // 2)
    return cA, cD


def idwt_last_mm(cA: jnp.ndarray, cD: jnp.ndarray,
                 rec_lo: np.ndarray, rec_hi: np.ndarray):
    """Inverse of :func:`dwt_last_mm`: (..., n//2) x2 -> (..., n)."""
    n = 2 * cA.shape[-1]
    C, tail, S0, S1 = _synthesis_mats(tuple(rec_lo), tuple(rec_hi), n)
    m = n // C
    half = C // 2
    a = cA.reshape(*cA.shape[:-1], m, half)
    d = cD.reshape(*cD.shape[:-1], m, half)
    cur = jnp.concatenate([a, d], axis=-1)
    y = jnp.matmul(cur, jnp.asarray(S0), precision=_PREC)
    if m > 1:
        pa = jnp.roll(a, 1, axis=-2)[..., half - tail:]
        pd = jnp.roll(d, 1, axis=-2)[..., half - tail:]
        prev = jnp.concatenate([pa, pd], axis=-1)
        y = y + jnp.matmul(prev, jnp.asarray(S1), precision=_PREC)
    return y.reshape(*cA.shape[:-1], n)
