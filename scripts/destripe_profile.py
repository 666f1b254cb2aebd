"""Component-wise destripe profile on the real chip.

Splits the destripe chain (ops/destripe._filter_streaks_impl) into its
stages — log1p, pad, wavedec2, notch (rfft*g -> irfft), waverec2, crop,
expm1 — and times each at the bench shape (16, 1024, 1024) u16, db9,
sigma (250, 250), unidirectional.  Decides whether the fused-Pallas-DWT
lever (docs/STATUS.md sketch) can clear its >15% acceptance bar before
any kernel is written.

Timing follows CLAUDE.md rules: warm first, queue Q dispatches, fetch one
scalar (block_until_ready returns early on axon).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np

from ipp_tpu.utils import jaxconfig

jaxconfig.enable_persistent_cache()

import jax
import jax.numpy as jnp

from ipp_tpu.ops import destripe as ds
from ipp_tpu.ops import wavelets as wv
from ipp_tpu.ops.intensity import expm1_clip, log1p_f32

SHAPE = (16, 1024, 1024)
SIGMA = (250.0, 250.0)
WAVELET = "db9"
Q = 15


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(Q)]
        # fetch one scalar from the last dispatch to fence the queue
        leaf = jax.tree_util.tree_leaves(outs[-1])[0]
        float(jnp.sum(leaf[..., :1, :1]))
        dt = (time.perf_counter() - t0) / Q
        best = min(best, dt)
    return best


def main():
    rng = np.random.default_rng(0)
    img = (rng.gamma(2.0, 200.0, SHAPE) + rng.normal(0, 30, SHAPE)).clip(0, 65535).astype(np.uint16)
    x = jnp.asarray(img)

    # full chain, production path
    full = timed(
        partial(ds.filter_streaks, sigma=SIGMA, wavelet=WAVELET), x)
    mpix = np.prod(SHAPE) / full / 1e6
    print(f"full filter_streaks: {full*1e3:.2f} ms  ({mpix:.0f} Mpix/s)")

    base_pad, (py, px), padded_shape, lv = ds._plan_padding(
        SHAPE[-2:], SIGMA, 0, WAVELET)
    print(f"padded shape {padded_shape}, level {lv}, base_pad {base_pad}")

    xf = log1p_f32(x)
    pad = [(0, 0), (base_pad, base_pad + py), (base_pad, base_pad + px)]
    xp = jnp.pad(xf, pad, mode="wrap")
    xp = jax.block_until_ready(xp)

    t_log = timed(jax.jit(log1p_f32), x)
    print(f"log1p: {t_log*1e3:.2f} ms")

    t_pad = timed(jax.jit(lambda a: jnp.pad(a, pad, mode='wrap')), xf)
    print(f"pad: {t_pad*1e3:.2f} ms")

    dec = jax.jit(partial(wv.wavedec2, wavelet=WAVELET, level=lv))
    t_dec = timed(dec, xp)
    print(f"wavedec2 (level {lv}): {t_dec*1e3:.2f} ms")

    coeffs = jax.block_until_ready(dec(xp))

    @jax.jit
    def notch_only(coeffs):
        out = [coeffs[0]]
        for det in coeffs[1:]:
            ch, cv, cd = det
            ch = ds.filter_coefficient(ch, SIGMA[0] / padded_shape[0], axis=-1)
            out.append((ch, cv, cd))
        return out

    t_notch = timed(notch_only, coeffs)
    print(f"notch chain (rfft*g->irfft per level): {t_notch*1e3:.2f} ms")

    rec = jax.jit(partial(wv.waverec2, wavelet=WAVELET))
    t_rec = timed(rec, coeffs)
    print(f"waverec2: {t_rec*1e3:.2f} ms")

    t_exp = timed(jax.jit(partial(expm1_clip, dtype="uint16")), xf)
    print(f"expm1_clip: {t_exp*1e3:.2f} ms")

    parts = t_log + t_pad + t_dec + t_notch + t_rec + t_exp
    print(f"sum of parts: {parts*1e3:.2f} ms vs full {full*1e3:.2f} ms "
          f"(XLA cross-stage fusion gap: {(parts-full)*1e3:.2f} ms)")

    # DWT-only round trip at the padded shape: the ceiling for any fused
    # DWT kernel win
    @jax.jit
    def dwt_roundtrip(a):
        return wv.waverec2(wv.wavedec2(a, WAVELET, lv), WAVELET)

    t_rt = timed(dwt_roundtrip, xp)
    print(f"wavedec2+waverec2 roundtrip: {t_rt*1e3:.2f} ms "
          f"({t_rt/full*100:.0f}% of full chain)")

    # per-level cost split: time level-1-only vs full-level decomposition
    for l1 in (1, 2):
        if l1 <= lv:
            d1 = jax.jit(partial(wv.wavedec2, wavelet=WAVELET, level=l1))
            t1 = timed(d1, xp)
            print(f"wavedec2 level<={l1}: {t1*1e3:.2f} ms")


if __name__ == "__main__":
    main()
