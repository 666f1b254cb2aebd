"""Minimal repro for the round-5 TPU-runtime crash in fused 2D gathers.

Historical record: before the separable-take fix (ops/ncc.py, r5),
ncc_maps_batched at production MIP sizes crashed the v5e runtime ("TPU
worker process crashed or restarted"; ~5-10 min tunnel wedge per hit) —
bisected to the FUSION of the 2D advanced-index gathers (the corr[u,v]
lag extraction and the integral-image corner sums); each component
passes eagerly.  This script exercises the same shapes end-to-end and
must print ns/we OK on current code.  If a future refactor reintroduces
a fancy-index form, this is the fastest on-chip check.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/ncc_fused_gather_repro.py [P dz]
"""
import sys

import numpy as np

from ipp_tpu.utils.jaxconfig import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402

from ipp_tpu.ops.ncc import align_pairs_batched  # noqa: E402

print("device:", jax.devices()[0], flush=True)
P = int(sys.argv[1]) if len(sys.argv) > 1 else 12
dz = int(sys.argv[2]) if len(sys.argv) > 2 else 60
th = tw = 1024
ov, sr = 150, 20
rng = np.random.default_rng(0)
a = rng.random((P, dz, th, tw), dtype=np.float32) * 1000
b = (np.roll(a, (3, -2), axis=(2, 3))
     + rng.normal(0, 5, a.shape).astype(np.float32))
for side in ("ns", "we"):
    res = align_pairs_batched(a, b, side, ov, sr, sr, max(1, min(sr, dz // 8)))
    print(f"{side} OK", res[0], flush=True)
print("ALL OK", flush=True)
