"""Prototype: y-axis (sublane) VPU polyphase DWT analysis kernel.

The x-axis VPU polyphase kernel measured 5.99 ms vs 4.66 matmul at
(16, 1664, 1664) db9 — unaligned LANE slices are lane rotations.  Along
y the tap shifts are SUBLANE slices, which Mosaic handles cheaply, and
the even/odd phase split is a second-minor strided slice (fuses into
DMA per CLAUDE.md).  If this wins big, the destripe DWT walk can run
both axes as y-passes around one transpose pair (the FFT v2 pattern).

Measures vs the current y-pass (moveaxis + chunked matmul + moveaxis).
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
from ipp_tpu.ops.mxu_dwt import dwt_last_mm

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


def _ykernel(ev_ref, od_ref, ca_ref, cd_ref, *, lo_taps, hi_taps):
    """ev/od: (h_half + halo, TX); outputs (h_half, TX)."""
    ev = ev_ref[0]
    od = od_ref[0]
    h_ext, tx = ev.shape
    half_l = len(lo_taps) // 2
    m_out = h_ext - half_l
    ca = jnp.zeros((m_out, tx), jnp.float32)
    cd = jnp.zeros((m_out, tx), jnp.float32)
    for m in range(half_l):
        seg_e = jax.lax.slice(ev, (m, 0), (m + m_out, tx))
        seg_o = jax.lax.slice(od, (m, 0), (m + m_out, tx))
        ca = ca + np.float32(lo_taps[2 * m]) * seg_e \
                + np.float32(lo_taps[2 * m + 1]) * seg_o
        cd = cd + np.float32(hi_taps[2 * m]) * seg_e \
                + np.float32(hi_taps[2 * m + 1]) * seg_o
    ca_ref[0] = ca
    cd_ref[0] = cd


def dwt_y_pallas(x, rec_lo, rec_hi, tx=256, interpret=False):
    """1-level circular DWT along axis -2 of (..., h, w)."""
    from jax.experimental import pallas as pl

    *lead, h, w = x.shape
    L = len(rec_lo)
    ext = jnp.concatenate([x, x[..., :L, :]], axis=-2)  # circular halo
    ev = ext[..., 0::2, :]   # (..., (h+L)//2, w)
    od = ext[..., 1::2, :]
    h_ext = ev.shape[-2]
    bsz = int(np.prod(lead)) if lead else 1
    ev = ev.reshape(bsz, h_ext, w)
    od = od.reshape(bsz, h_ext, w)
    padw = (-w) % tx
    if padw:
        ev = jnp.pad(ev, ((0, 0), (0, 0), (0, padw)))
        od = jnp.pad(od, ((0, 0), (0, 0), (0, padw)))
    wp = ev.shape[-1]
    grid = (bsz, wp // tx)
    ca, cd = pl.pallas_call(
        partial(_ykernel, lo_taps=tuple(map(float, rec_lo)),
                hi_taps=tuple(map(float, rec_hi))),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h // 2, wp), jnp.float32),
            jax.ShapeDtypeStruct((bsz, h // 2, wp), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h_ext, tx), lambda b, j: (b, 0, j)),
            pl.BlockSpec((1, h_ext, tx), lambda b, j: (b, 0, j)),
        ],
        out_specs=(
            pl.BlockSpec((1, h // 2, tx), lambda b, j: (b, 0, j)),
            pl.BlockSpec((1, h // 2, tx), lambda b, j: (b, 0, j)),
        ),
        interpret=interpret,
    )(ev, od)
    if padw:
        ca = ca[..., :w]
        cd = cd[..., :w]
    return ca.reshape(*lead, h // 2, w), cd.reshape(*lead, h // 2, w)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W)).astype(np.float32))
    _, _, rec_lo, rec_hi = wv.filter_bank(WAVELET)

    def y_today(a):
        at = jnp.moveaxis(a, -2, -1)
        ca, cd = dwt_last_mm(at, rec_lo, rec_hi)
        return jnp.moveaxis(ca, -1, -2), jnp.moveaxis(cd, -1, -2)

    t_b = timed(jax.jit(y_today), x)
    print(f"y-pass matmul via transposes (current): {t_b*1e3:.2f} ms")

    f_y = jax.jit(lambda a: dwt_y_pallas(a, rec_lo, rec_hi))
    t_y = timed(f_y, x)
    print(f"y-pass pallas sublane VPU: {t_y*1e3:.2f} ms")

    ca_b, cd_b = jax.jit(y_today)(x)
    ca_y, cd_y = f_y(x)
    err = float(jnp.max(jnp.abs(ca_b - ca_y)) + jnp.max(jnp.abs(cd_b - cd_y)))
    print(f"  max abs err vs matmul: {err:.2e}")

    # wider and narrower lane tiles
    for tx in (128,):
        t = timed(jax.jit(lambda a, tx=tx: dwt_y_pallas(a, rec_lo, rec_hi, tx=tx)), x)
        print(f"  tx={tx}: {t*1e3:.2f} ms")

    # x-pass via transpose + y kernel + transpose (walk candidate)
    def x_via_y(a):
        at = jnp.moveaxis(a, -2, -1)
        ca, cd = dwt_y_pallas(at, rec_lo, rec_hi)
        return jnp.moveaxis(ca, -1, -2), jnp.moveaxis(cd, -1, -2)

    t_xy = timed(jax.jit(x_via_y), x)
    print(f"x-pass = T + y-kernel + T: {t_xy*1e3:.2f} ms "
          f"(vs 4.66 ms matmul x-pass)")


if __name__ == "__main__":
    main()
