"""A/B: does the uniform 100 MB scoped-VMEM cap (round-4 fix for the
ny=512 ratio-rfft kernel) change 256^3 RL decon speed vs Mosaic's 16 MB
default?  Round-3 measured 332 Mvox/s core (2.02 ns/vox) on 256^3; every
round-4 session measures ~2.38-2.41 ns/vox, and the cap landed in
between.  Run on the live chip: PYTHONPATH=/root/repo:/root/.axon_site
python scripts/vmem_cap_ab.py
"""
import time

import numpy as np

from ipp_tpu.utils.jaxconfig import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from ipp_tpu.ops import pallas_fft
from ipp_tpu.ops.deconv import richardson_lucy
from ipp_tpu.ops.psf import gaussian_psf

print("device:", jax.devices()[0])
rng = np.random.default_rng(0)
shape = (256, 256, 256)
vol = jnp.asarray(rng.random(shape, dtype=np.float32) * 1000.0)
psf = jnp.asarray(gaussian_psf((9, 9, 9), (2.0, 2.0, 2.0)))

orig = pallas_fft._compiler_params


def run_case(name, params_fn, reps=15):
    # sanity probe (ADVICE r4): the A/B only measures anything if the
    # monkey-patched _compiler_params is re-resolved after clear_caches —
    # wrap it with a call counter and assert it fired during the retrace.
    # A refactor that binds params at import time (or imports the symbol
    # directly) would otherwise silently yield a bogus ~1.0 ratio.
    calls = {"n": 0}

    def counted(pltpu):
        calls["n"] += 1
        p = params_fn(pltpu)
        if calls["n"] == 1:
            print(f"  params_fn active: vmem_limit_bytes="
                  f"{getattr(p, 'vmem_limit_bytes', None)}")
        return p

    pallas_fft._compiler_params = counted
    # distinct cache-key: compiler params feed the executable, but the
    # jitted wrappers cache on python-level args — clear them
    jax.clear_caches()

    def run_many():
        acc = jnp.float32(0)
        for _ in range(reps):
            acc = acc + jnp.sum(richardson_lucy(
                vol, psf, niter=10, stop_criterion=0.0, fft_shape=shape))
        return float(acc)

    t0 = time.time()
    run_many()
    warm = time.time() - t0
    assert calls["n"] > 0, (
        "params_fn never fired after clear_caches — the monkey-patch is "
        "dead and both arms would measure the same executable")
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        run_many()
        best = min(best, (time.time() - t0) / reps)
    ns_vox = best / np.prod(shape) * 1e9
    core = np.prod([s - 32 for s in shape]) / best / 1e6
    # NOTE (ADVICE r4): with the persistent compilation cache on, 'warm'
    # can be served from disk for the production cap while the other arm
    # compiles cold — warm times are NOT comparable across arms; only the
    # best-of-3 steady-state figures are.
    print(f"{name}: warm {warm:.1f}s (incl. possible asymmetric "
          f"persistent-cache hits; not comparable across arms) "
          f"best {best * 1e3:.1f} ms/block "
          f"{ns_vox:.3f} ns/vox core {core:.1f} Mvox/s")
    return best


def cap_100(pltpu):
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20)


def cap_default(pltpu):
    return pltpu.CompilerParams()


try:
    b100 = run_case("cap=100MB", cap_100)
    bdef = run_case("cap=default(16MB)", cap_default)
    b100b = run_case("cap=100MB (repeat)", cap_100)
    print(f"ratio default/100MB: {bdef / b100:.3f} "
          f"(repeat ratio {bdef / b100b:.3f})")
finally:
    pallas_fft._compiler_params = orig
