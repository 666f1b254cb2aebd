"""Golden cross-validation against the reference's OWN
supplements/downsampling.py (run verbatim; matplotlib is real here).

Its atlas-registration downsampler factors each axis factor into primes
and mean-pools stage by stage, truncating the tail at every stage
(downsampling.py:79-198).  Staged prime-factor pooling over the first
floor(n/d)*d samples is algebraically one d-pool — so our single-shot
mean block_reduce on the truncated array must match to float tolerance,
composite factors included."""

import sys

import numpy as np
import pytest

from ipp_tpu.ops.resample import block_reduce
from tests.refshims import REF, install_process_images_shims, install_shims

pytestmark = pytest.mark.skipif(
    not (REF / "supplements" / "downsampling.py").exists(),
    reason="reference downsampling.py unavailable")


@pytest.fixture(scope="module")
def ref_ds():
    install_shims()
    install_process_images_shims()  # tifffile.natural_sorted for TifStack
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import supplements.downsampling as rd  # noqa: PLC0415

    return rd


def test_prime_factor_matches_reference(ref_ds):
    for d in (2, 3, 4, 6, 12, 13, 36):
        ours = []
        n, p = d, 2
        while n > 1:
            while n % p == 0:
                ours.append(p)
                n //= p
            p += 1
        assert sorted(ref_ds.prime_factor(d)) == sorted(ours) or d == 1


@pytest.mark.parametrize("shape,down", [
    ((9, 26, 17), (2, 6, 4)),
    ((8, 24, 16), (2, 12, 4)),
    ((5, 13, 11), (1, 3, 2)),
])
def test_downsample_matches_block_reduce(ref_ds, shape, down):
    rng = np.random.default_rng(11)
    vol = rng.random(shape).astype(np.float64) * 100.0
    ref = ref_ds.downsample(vol, list(down))
    trunc = vol[tuple(slice(0, (s // d) * d)
                      for s, d in zip(shape, down))]
    ours = np.asarray(block_reduce(trunc, down, "mean"))
    assert ref.shape == ours.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_downsample_golden_fuzz(ref_ds):
    """Seeded fuzz: random shapes and factor triples (incl. factor-1
    axes and non-divisible extents) vs the reference's downsample."""
    r = np.random.default_rng(20260819)
    for _ in range(10):
        shape = tuple(int(r.integers(4, 30)) for _ in range(3))
        down = tuple(int(r.integers(1, 7)) for _ in range(3))
        if any(s < d for s, d in zip(shape, down)):
            continue
        vol = r.random(shape).astype(np.float64) * 100.0
        ref = ref_ds.downsample(vol, list(down))
        trunc = vol[tuple(slice(0, (s // d) * d)
                          for s, d in zip(shape, down))]
        ours = np.asarray(block_reduce(trunc, down, "mean"))
        assert ref.shape == ours.shape, (shape, down)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4,
                                   err_msg=str((shape, down)))
