"""RL decon block-size sweep: does a bigger overlap-save block raise the
CORE-voxel rate?  Same methodology as bench.py's decon stage (deep
dispatch queue, scalar fetch, best-of-3 windows).

Round-4 results on v5e (after the scoped-VMEM fix in ops/pallas_fft.py
let the fused radix walk compile at ny=512) — the `_block_cost`
calibration set (pipeline/deconvolve.py):

    (256, 256, 256): 40 ms/block  2.384 ns/vox  core 277.5 Mvox/s
    (256, 512, 512): 165 ms       2.459 (1.03x) core 312.9
    (256, 512, 768): 256 ms       2.540 (1.065x)core 309.5
    (768, 256, 512): 265 ms       2.633 (1.104x)core 298.6
    (384, 512, 512): 438 ms       4.350 (1.82x — non-256-multiple axis)
    (512, 512, 256): 167 ms       2.489 (headline stage until 512^3)
    (512, 512, 512): 324 ms       2.414 (1.013x — near-FLAT: big z
                     batches the x/y radix walks) core 341.4 Mvox/s.
                     Admitted by raising the default block budget to
                     160 Mi-elems; now the planned production block
                     for the reference volume (bench.py headline).
    (256, 768, 768): 426 ms       2.825 (1.185x — the model predicted
                     1.136: axis interactions err both ways, hence the
                     `_MEASURED_RATIO` table in pipeline/deconvolve.py)

Fused 256-multiple axes are per-voxel near-flat (small creep, steeper
when the big axis sits in z); per-block dispatch overhead is ~0.
"""
import time

import numpy as np

from ipp_tpu.utils.jaxconfig import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp

from ipp_tpu.ops.deconv import richardson_lucy
from ipp_tpu.ops.psf import gaussian_psf

rng = np.random.default_rng(0)
psf = jnp.asarray(gaussian_psf((9, 9, 9), (2.0, 2.0, 2.0)))
halo = 16
niter = 10

for shape, reps in [((256, 256, 256), 15), ((256, 512, 512), 5),
                    ((512, 512, 256), 5), ((384, 512, 512), 4),
                    ((256, 512, 768), 4), ((768, 256, 512), 4),
                    ((512, 512, 512), 4), ((256, 768, 768), 4)]:
    vol = jnp.asarray(rng.random(shape, dtype=np.float32) * 1000.0)
    core = np.prod([s - 2 * halo for s in shape])

    def run_many(r):
        acc = jnp.float32(0)
        for _ in range(r):
            acc = acc + jnp.sum(richardson_lucy(
                vol, psf, niter=niter, stop_criterion=0.0, fft_shape=shape))
        return float(acc)

    t0 = time.time(); run_many(1); comp = time.time() - t0
    run_many(reps)
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); run_many(reps)
        best = min(best, (time.time() - t0) / reps)
    print(f"{shape}: compile {comp:.0f}s, {best*1e3:.0f} ms/block, "
          f"core {core/best/1e6:.1f} Mvox/s, "
          f"padded {np.prod(shape)/best/1e6:.1f} Mvox/s "
          f"({best/np.prod(shape)*1e9:.3f} ns/vox)", flush=True)
