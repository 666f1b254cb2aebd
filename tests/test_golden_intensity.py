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


def test_butter_lowpass_matches_reference(rng):
    """filtfilt1 vs the reference's butter_lowpass_filter (scipy
    sosfiltfilt, pystripe/core.py:493-499) on 1D and 2D float inputs."""
    core = load_pystripe_core()
    for shape in [(257,), (40, 257), (1, 31)]:
        x = rng.random(shape).astype(np.float64) * 9 + 1
        for freq in (0.005, 0.05, 0.3):
            ref = core.butter_lowpass_filter(x.copy(), freq)
            from ipp_tpu.ops.intensity import butter_lowpass_coeffs, filtfilt1

            b, a = butter_lowpass_coeffs(freq)
            ours = np.asarray(filtfilt1(jnp.asarray(x), b, a))
            # jax runs f32 (x64 disabled); scipy's sosfiltfilt is f64
            np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("max_method", [False, True])
def test_correct_bleaching_matches_reference(max_method, rng):
    """correct_bleaching vs the reference run verbatim
    (pystripe/core.py:501-558), both filter modes, incl. the clip_min
    lower bound and the zero->clip_med substitution."""
    core = load_pystripe_core()
    from ipp_tpu.ops.intensity import correct_bleaching

    decay = np.exp(-np.arange(128) / 60.0)[None, :]
    img = (rng.random((96, 128)) * 800 + 50) * decay
    img[img < 52] = 0.0  # zero background pixels exercise the clip_med path
    logged = np.log1p(img).astype(np.float32)
    lo, med, hi = 0.3, float(np.median(logged[logged > 0])), float(logged.max())
    freq = 1.0 / 128
    ref = core.correct_bleaching(logged.copy().astype(np.float64), freq,
                                 lo, med, hi, max_method=max_method)
    ours = np.asarray(correct_bleaching(jnp.asarray(logged, jnp.float64),
                                        freq, lo, med, hi,
                                        max_method=max_method))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_foreground_fraction_matches_reference(rng):
    """foreground_fraction vs the reference (pystripe/core.py:586-601):
    sigmoid((img-threshold)/crossover); the reference's GaussianBlur
    return value is DISCARDED (its shipped smoothing is a no-op), so the
    parity point is smoothing=0 — exactly how ops/destripe.py calls it."""
    core = load_pystripe_core()
    from ipp_tpu.ops.intensity import foreground_fraction

    img = (rng.random((64, 80)) * 6 - 3).astype(np.float32)
    ref = core.foreground_fraction(img.copy(), 0.5, 1.2, sigma=3)
    ours = np.asarray(foreground_fraction(jnp.asarray(img), 0.5, 1.2,
                                          smoothing=0))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


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


def test_hist_match_matches_reference(rng):
    """The reference's OWN hist_match (pystripe/core.py:426-470, the
    unique/ECDF/interp formulation) vs ours on integer images with
    repeated values and different template shapes."""
    core = load_pystripe_core()
    import jax.numpy as jnp

    from ipp_tpu.ops.intensity import hist_match

    src = rng.integers(0, 4000, (64, 80)).astype(np.uint16)
    tmpl = rng.integers(1000, 60000, (50, 30)).astype(np.uint16)
    ref = core.hist_match(src, tmpl)
    ours = np.asarray(hist_match(jnp.asarray(src), jnp.asarray(tmpl)))
    assert ours.shape == src.shape
    np.testing.assert_allclose(ours, np.asarray(ref, np.float64),
                               rtol=0, atol=1.0)


def test_correct_bleaching_golden_fuzz(rng):
    """Seeded fuzz over the bleach-correction config surface
    (pystripe/core.py:501-558): random decay constants, frequencies,
    clip triplets, zero-pixel fractions and both filter modes."""
    core = load_pystripe_core()
    from ipp_tpu.ops.intensity import correct_bleaching

    r = np.random.default_rng(20260819)
    for _ in range(8):
        h = int(r.integers(48, 160))
        w = int(r.integers(64, 257))
        tau = float(r.uniform(20.0, 200.0))
        decay = np.exp(-np.arange(w) / tau)[None, :]
        img = (r.random((h, w)) * float(r.uniform(300, 2000)) + 50) * decay
        if r.random() < 0.5:
            img[img < float(np.percentile(img, 10))] = 0.0
        logged = np.log1p(img).astype(np.float32)
        pos = logged[logged > 0]
        lo = float(r.uniform(0.1, 0.5))
        med = float(np.median(pos))
        hi = float(logged.max())
        freq = float(r.choice([0.5, 1.0, 2.0])) / w
        max_method = bool(r.integers(0, 2))
        ref = core.correct_bleaching(
            logged.copy().astype(np.float64), freq, lo, med, hi,
            max_method=max_method)
        ours = np.asarray(correct_bleaching(
            jnp.asarray(logged, jnp.float64), freq, lo, med, hi,
            max_method=max_method))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=str((h, w, tau, freq,
                                                max_method)))


def test_hist_match_golden_fuzz(rng):
    """Seeded fuzz: random source/template value ranges and shapes
    (incl. constant templates and heavy value repetition) through the
    reference's hist_match (pystripe/core.py:426-470)."""
    core = load_pystripe_core()
    import jax.numpy as jnp

    from ipp_tpu.ops.intensity import hist_match

    r = np.random.default_rng(20260819)
    for i in range(8):
        sh = (int(r.integers(16, 97)), int(r.integers(16, 97)))
        th = (int(r.integers(8, 65)), int(r.integers(8, 65)))
        s_hi = int(r.choice([16, 255, 4000, 65535]))
        t_lo = int(r.integers(0, 1000))
        t_hi = t_lo + int(r.choice([1, 50, 30000]))
        src = r.integers(0, s_hi + 1, sh).astype(np.uint16)
        tmpl = r.integers(t_lo, t_hi + 1, th).astype(np.uint16)
        ref = core.hist_match(src, tmpl)
        ours = np.asarray(hist_match(jnp.asarray(src), jnp.asarray(tmpl)))
        np.testing.assert_allclose(ours, np.asarray(ref, np.float64),
                                   rtol=0, atol=1.0,
                                   err_msg=str((i, sh, th, s_hi, t_lo,
                                                t_hi)))


def test_estimate_bit_shift_golden_fuzz(rng):
    """Seeded fuzz over image peak ranges and thresholds (reference
    estimate_bit_shift, process_images.py)."""
    install_shims()
    install_process_images_shims()
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import process_images as rp

    r = np.random.default_rng(20260819)
    for _ in range(12):
        peak = float(r.choice([50, 200, 900, 4000, 20000, 60000]))
        thr = float(r.choice([0.1, 0.5, 1.0, 2.0, 5.0]))
        img = np.log1p(r.random((64, 64)).astype(np.float32) * peak)
        assert rp.estimate_bit_shift(img, thr) == \
            estimate_bit_shift(img, thr), (peak, thr)
