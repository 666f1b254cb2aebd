"""DWT formulation experiments on the real chip (destripe lever).

Measures, at the destripe level-1 shape (16, 1664, 1664) f32 db9:

A. chunked lane-axis DWT (current mxu_dwt path) — baseline x-pass
B. y-pass as done today: moveaxis -> chunked matmul -> moveaxis back
C. y-pass as a sublane-contracting einsum with a DENSE stacked analysis
   matrix (no transpose at all) — the v2-FFT trick at XLA level
D. x-pass with a DENSE analysis matrix (lane contraction)
E. notch chain: jnp.fft.rfft * g -> irfft (current) vs one circulant
   matmul K = irfft(diag(g) rfft(.)) along lanes
"""
import sys
import time
from functools import lru_cache, partial

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
PREC = jax.lax.Precision.HIGH


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


@lru_cache(maxsize=8)
def dense_analysis(n: int, wavelet: str):
    """(n, n) dense analysis matrix: x (.., n) @ M -> [cA | cD] (.., n)."""
    _, _, rec_lo, rec_hi = wv.filter_bank(wavelet)
    L = len(rec_lo)
    M = np.zeros((n, n), np.float32)
    half = n // 2
    for i in range(half):
        for k in range(L):
            j = (2 * i + k) % n
            M[j, i] += rec_lo[k]
            M[j, half + i] += rec_hi[k]
    return M


@lru_cache(maxsize=8)
def notch_mat(n: int, sigma: float):
    """(n, n) circulant equivalent of irfft(rfft(x) * g)."""
    from ipp_tpu.ops.destripe import notch

    g = notch(n // 2 + 1, 0.5 * sigma).astype(np.float64)
    # K = F_r^H diag(g) F_r as a real circulant: first column via irfft
    col = np.fft.irfft(g, n=n)
    # circulant: K[i, j] = col[(i - j) % n]; y = x @ K with y[t]=sum_j x[j] col[t-j]
    idx = (np.arange(n)[None, :] - np.arange(n)[:, None]) % n
    return col[idx].astype(np.float32).T


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W)).astype(np.float32))
    _, _, rec_lo, rec_hi = wv.filter_bank(WAVELET)

    # A: chunked lane x-pass (current)
    f_a = jax.jit(lambda a: dwt_last_mm(a, rec_lo, rec_hi))
    t_a = timed(f_a, x)
    print(f"A chunked lane x-pass: {t_a*1e3:.2f} ms")

    # B: y-pass today (moveaxis + chunked + moveaxis)
    def y_today(a):
        at = jnp.moveaxis(a, -2, -1)
        ca, cd = dwt_last_mm(at, rec_lo, rec_hi)
        return jnp.moveaxis(ca, -1, -2), jnp.moveaxis(cd, -1, -2)

    t_b = timed(jax.jit(y_today), x)
    print(f"B y-pass via transposes (current): {t_b*1e3:.2f} ms")

    # C: y-pass as sublane einsum, dense stacked matrix
    M = dense_analysis(H, WAVELET)

    def y_einsum(a):
        return jnp.einsum("kh,bkw->bhw", jnp.asarray(M), a, precision=PREC)

    t_c = timed(jax.jit(y_einsum), x)
    print(f"C y-pass sublane einsum dense: {t_c*1e3:.2f} ms")

    # C2: correctness vs B
    ca_b, cd_b = jax.jit(y_today)(x)
    packed = jax.jit(y_einsum)(x)
    ca_c, cd_c = packed[:, : H // 2], packed[:, H // 2:]
    err = float(jnp.max(jnp.abs(ca_c - ca_b)) + jnp.max(jnp.abs(cd_c - cd_b)))
    print(f"   einsum-vs-chunked max abs err: {err:.2e}")

    # D: dense lane x-pass
    def x_dense(a):
        return jnp.matmul(a, jnp.asarray(M), precision=PREC)

    t_d = timed(jax.jit(x_dense), x)
    print(f"D dense lane x-pass: {t_d*1e3:.2f} ms")

    # E: notch current vs circulant matmul (level-1 cH shape (16, 832, 832))
    ch = jnp.asarray(rng.standard_normal((B, H // 2, W // 2)).astype(np.float32))
    sigma = 250.0 / 1024.0 * ch.shape[-2]  # mirrors filter_coefficient sigma

    def notch_fft(c):
        n = c.shape[-1]
        from ipp_tpu.ops.destripe import notch as notch_vec

        f = jnp.fft.rfft(c, axis=-1)
        g = jnp.asarray(notch_vec(f.shape[-1], 0.5 * sigma))
        return jnp.fft.irfft(f * g, n=n, axis=-1)

    t_e1 = timed(jax.jit(notch_fft), ch)
    print(f"E1 notch via rfft/irfft: {t_e1*1e3:.2f} ms")

    K = notch_mat(ch.shape[-1], sigma)

    def notch_mm(c):
        return jnp.matmul(c, jnp.asarray(K), precision=PREC)

    t_e2 = timed(jax.jit(notch_mm), ch)
    o1 = jax.jit(notch_fft)(ch)
    o2 = jax.jit(notch_mm)(ch)
    err_n = float(jnp.max(jnp.abs(o1 - o2)))
    print(f"E2 notch via circulant matmul: {t_e2*1e3:.2f} ms "
          f"(max abs err vs fft: {err_n:.2e})")

    # F: fused level-1 fwd: dense x then einsum y on packed (both subbands)
    def level1_fused(a):
        xw = jnp.matmul(a, jnp.asarray(M), precision=PREC)
        return jnp.einsum("kh,bkw->bhw", jnp.asarray(M), xw, precision=PREC)

    t_f = timed(jax.jit(level1_fused), x)
    cur = t_a + t_b  # current level-1 fwd cost (x chunked + y transposed)
    print(f"F dense level-1 fwd (x+y, packed): {t_f*1e3:.2f} ms "
          f"vs current ~{cur*1e3:.2f} ms")


if __name__ == "__main__":
    main()
