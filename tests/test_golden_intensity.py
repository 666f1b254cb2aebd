"""Golden cross-validation of intensity conversions against the
reference's OWN code (pystripe/core.py and process_images.py run verbatim
via tests/refshims).

convert_to_8bit_fun's nonzero->1 semantics and estimate_bit_shift's
percentile/expm1 bracket are load-bearing for every 8-bit export; pin
them by executing the reference functions, not re-derived expectations.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from ipp_tpu.ops.intensity import convert_to_8bit
from ipp_tpu.ops.stats import estimate_bit_shift
from tests.refshims import (REF, install_process_images_shims,
                            install_shims, load_pystripe_core)

pytestmark = pytest.mark.skipif(
    not (REF / "pystripe" / "core.py").exists(),
    reason="reference pystripe unavailable")


def _edge_images(rng):
    imgs = [rng.integers(0, 65536, (64, 64)).astype(np.uint16)]
    edge = np.array([0, 1, 2, 127, 128, 255, 256, 257, 511, 512,
                     65534, 65535] * 12, np.uint16).reshape(12, 12)
    imgs.append(edge)
    return imgs


@pytest.mark.parametrize("shift", list(range(9)))
def test_convert_to_8bit_matches_reference(shift, rng):
    core = load_pystripe_core()
    for img in _edge_images(rng):
        # the reference mutates in place via >>= semantics; copy per call
        ref = core.convert_to_8bit_fun(img.copy(),
                                       bit_shift_to_right=shift)
        ours = np.asarray(convert_to_8bit(jnp.asarray(img), shift))
        assert ref.dtype == ours.dtype == np.uint8
        np.testing.assert_array_equal(ours, ref)


def test_estimate_bit_shift_matches_reference(rng):
    install_shims()
    install_process_images_shims()
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import process_images as rp

    for peak, thr in [(40000.0, 2.0), (3000.0, 1.0), (600.0, 0.5),
                      (120.0, 0.2)]:
        img = np.log1p(
            rng.random((96, 96)).astype(np.float32) * peak)
        ref = rp.estimate_bit_shift(img, thr)
        ours = estimate_bit_shift(img, thr)
        assert ref == ours, (peak, thr, ref, ours)
