"""A/B: lightsheet bg-field counting reduce — strided (1,3)-axis layout
(shipped) vs transposed lane layout (VERDICT r4 item 6).

The bg field's window-sample tensor is (n_cx, kx, B*n_cy, ky) =
(81, 100, 81B, 100); every bisection pass re-reads it reducing over the
strided axes (1, 3), and the ky=100 lane dim pads to 128 (+28% traffic).
The candidate transposes once to (n_cx, B*n_cy, kx*ky) so each pass is a
dense contiguous minor-axis reduction (kx*ky = 10000 pads ~1%).

Run on the live chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/lightsheet_layout_ab.py
"""
import time

import numpy as np

from ipp_tpu.utils.jaxconfig import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
from functools import partial

from ipp_tpu.ops import lightsheet as ls

print("device:", jax.devices()[0])
rng = np.random.default_rng(0)


@partial(jax.jit, static_argnames=("iters",))
def bisect_13(p, rank, iters=11):
    """The shipped reduce (ops/lightsheet._bisect_rank_axes)."""
    lo = jnp.min(p, axis=(1, 3)).astype(jnp.float32)
    hi = jnp.max(p, axis=(1, 3)).astype(jnp.float32)
    lo = lo - 1e-3 * (hi - lo + 1.0)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((p <= mid[:, None, :, None]).astype(jnp.float32),
                      axis=(1, 3))
        take = cnt >= rank
        return jnp.where(take, lo, mid), jnp.where(take, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return hi


@partial(jax.jit, static_argnames=("iters",))
def bisect_lane(p4, rank, iters=11):
    """Candidate: transpose once, reduce over the contiguous minor axis."""
    n_cx, kx, bcy, ky = p4.shape
    p = p4.transpose(0, 2, 1, 3).reshape(n_cx, bcy, kx * ky)
    lo = jnp.min(p, axis=-1).astype(jnp.float32)
    hi = jnp.max(p, axis=-1).astype(jnp.float32)
    lo = lo - 1e-3 * (hi - lo + 1.0)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((p <= mid[..., None]).astype(jnp.float32), axis=-1)
        take = cnt >= rank
        return jnp.where(take, lo, mid), jnp.where(take, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return hi


def timeit(fn, *a, reps=20):
    fn(*a)  # compile
    float(jnp.sum(fn(*a)))  # settle
    t0 = time.time()
    outs = [fn(*a) for _ in range(reps)]
    float(jnp.sum(outs[-1]))
    return (time.time() - t0) / reps


for B in (1, 4):
    p4 = jnp.asarray(rng.integers(0, 60000, (81, 100, 81 * B, 100))
                     .astype(np.uint16))
    rank = jnp.float32(0.25 * (100 * 100 - 1) + 1)
    t13 = timeit(bisect_13, p4, rank)
    tlane = timeit(bisect_lane, p4, rank)
    a = np.asarray(bisect_13(p4, rank))
    b = np.asarray(bisect_lane(p4, rank))
    print(f"B={B}: strided(1,3) {t13*1e3:.2f} ms | lane {tlane*1e3:.2f} ms "
          f"| speedup {t13/tlane:.2f}x | max|dv| {np.abs(a-b).max():.4f}")

# end-to-end: the shipped correct_lightsheet for context
img = jnp.asarray(rng.integers(0, 60000, (2048, 2048)).astype(np.uint16))
t = timeit(lambda x: ls.correct_lightsheet(x), img, reps=10)
print(f"correct_lightsheet 2048^2 single plane: {t*1e3:.2f} ms "
      f"({2048*2048/t/1e6:.0f} Mpix/s)")
img4 = jnp.asarray(rng.integers(0, 60000, (4, 2048, 2048)).astype(np.uint16))
t4 = timeit(lambda x: ls.correct_lightsheet(x), img4, reps=10)
print(f"correct_lightsheet 2048^2 batch 4: {t4*1e3:.2f} ms "
      f"({4*2048*2048/t4/1e6:.0f} Mpix/s)")
