"""Measure the Pallas polyphase DWT analysis kernel vs the MXU matmul path
on the real chip at the destripe level-1 shape (16, 1664, 1664) db9.

Decides whether to adopt the VPU kernel for the x-pass and whether a
y-axis (sublane-sliced, transpose-free) variant + synthesis kernels are
worth writing.  Timing per CLAUDE.md: warm, queue Q dispatches, fetch one
scalar.
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np

from ipp_tpu.utils import jaxconfig

jaxconfig.enable_persistent_cache()

import jax
import jax.numpy as jnp

from ipp_tpu.ops import wavelets as wv
from ipp_tpu.ops.mxu_dwt import dwt_last_mm, idwt_last_mm
from ipp_tpu.ops.pallas_dwt import dwt_analysis_pallas

B, H, W = 16, 1664, 1664
WAVELET = "db9"
Q = 15


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(Q)]
        leaf = jax.tree_util.tree_leaves(outs[-1])[0]
        float(jnp.sum(leaf[..., :1, :1]))
        best = min(best, (time.perf_counter() - t0) / Q)
    return best


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W)).astype(np.float32))
    _, _, rec_lo, rec_hi = wv.filter_bank(WAVELET)

    f_mm = jax.jit(lambda a: dwt_last_mm(a, rec_lo, rec_hi))
    t_mm = timed(f_mm, x)
    print(f"x-pass matmul: {t_mm*1e3:.2f} ms")

    f_pl = jax.jit(lambda a: dwt_analysis_pallas(a, rec_lo, rec_hi))
    t_pl = timed(f_pl, x)
    print(f"x-pass pallas polyphase: {t_pl*1e3:.2f} ms")

    a_mm, d_mm = f_mm(x)
    a_pl, d_pl = f_pl(x)
    err = float(jnp.max(jnp.abs(a_mm - a_pl)) + jnp.max(jnp.abs(d_mm - d_pl)))
    print(f"  max abs err pallas vs matmul: {err:.2e}")

    # y-pass today (moveaxis + matmul + moveaxis) for context
    def y_today(a):
        at = jnp.moveaxis(a, -2, -1)
        ca, cd = dwt_last_mm(at, rec_lo, rec_hi)
        return jnp.moveaxis(ca, -1, -2), jnp.moveaxis(cd, -1, -2)

    t_y = timed(jax.jit(y_today), x)
    print(f"y-pass matmul via transposes: {t_y*1e3:.2f} ms")

    # y-pass via pallas on the transposed view (transposes still paid)
    def y_pallas(a):
        at = jnp.moveaxis(a, -2, -1)
        ca, cd = dwt_analysis_pallas(at, rec_lo, rec_hi)
        return jnp.moveaxis(ca, -1, -2), jnp.moveaxis(cd, -1, -2)

    t_yp = timed(jax.jit(y_pallas), x)
    print(f"y-pass pallas via transposes: {t_yp*1e3:.2f} ms")

    # inverse matmul for context
    ca, cd = jax.block_until_ready(f_mm(x))
    f_imm = jax.jit(lambda a, d: idwt_last_mm(a, d, rec_lo, rec_hi))
    t_imm = timed(f_imm, ca, cd)
    print(f"x-inverse matmul: {t_imm*1e3:.2f} ms")


if __name__ == "__main__":
    main()
