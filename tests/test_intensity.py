import numpy as np
import pytest
import scipy.signal as sps

from ipp_tpu.ops import intensity as it
from ipp_tpu.ops import stats


def test_convert_to_8bit_semantics(rng):
    """Nonzero values below the shift LSB map to 1
    (reference: pystripe/core.py:402-424)."""
    import jax.numpy as jnp

    img = np.array([[0, 1, 255, 256, 257, 65535]], np.uint16)
    out = np.asarray(it.convert_to_8bit(jnp.asarray(img), 8))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, [[0, 1, 1, 1, 1, 255]])
    out4 = np.asarray(it.convert_to_8bit(jnp.asarray(img), 4))
    np.testing.assert_array_equal(out4, [[0, 1, 15, 16, 16, 255]])


def test_convert_to_8bit_matches_numpy_reference(rng):
    import jax.numpy as jnp

    img = rng.integers(0, 65536, (64, 64)).astype(np.uint16)
    shift = 8
    lower = 1 << shift
    ref = np.where((img > 0) & (img < lower), 1, img >> shift)
    ref = np.clip(ref, 0, 255).astype(np.uint8)
    out = np.asarray(it.convert_to_8bit(jnp.asarray(img), shift))
    np.testing.assert_array_equal(out, ref)


def test_subtract_dark():
    import jax.numpy as jnp

    img = jnp.asarray(np.array([0, 5, 100, 101, 200], np.float32))
    out = np.asarray(it.subtract_dark(img, 100.0))
    np.testing.assert_array_equal(out, [0, 0, 0, 1, 100])


def test_butter_coeffs_match_scipy():
    for fc in (0.001, 0.01, 0.1, 0.5):
        b, a = it.butter_lowpass_coeffs(fc)
        b_ref, a_ref = sps.butter(1, fc)
        np.testing.assert_allclose(b, b_ref, rtol=1e-10)
        np.testing.assert_allclose(a, a_ref, rtol=1e-10)


@pytest.mark.parametrize("fc", [0.01, 0.1])
def test_filtfilt_matches_scipy(fc, rng):
    import jax.numpy as jnp

    x = rng.standard_normal((3, 200)).astype(np.float64)
    b, a = it.butter_lowpass_coeffs(fc)
    sos = sps.butter(1, fc, output="sos")
    ref = sps.sosfiltfilt(sos, x, axis=-1)
    out = np.asarray(it.filtfilt1(jnp.asarray(x), b, a))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_correct_bleaching_flattens_decay(rng):
    """A bleaching ramp times structure should be flattened to ~constant
    row-mean (reference correct_bleaching, pystripe/core.py:501-566)."""
    import jax.numpy as jnp

    h = w = 256
    decay = np.exp(-np.arange(w) / 200.0)
    img = (1000.0 * decay[None, :] * np.ones((h, 1))).astype(np.float32)
    x = np.log1p(img)
    out = np.asarray(it.correct_bleaching(
        jnp.asarray(x), 1.0 / w, float(np.log1p(2)), float(np.log1p(100)),
        float(np.log1p(900))))
    col_means = np.expm1(out).mean(axis=0)
    in_ratio = float(img.max() / img.min())  # ~3.6x decay
    out_ratio = col_means.max() / col_means.min()
    # the reference algorithm corrects in log space, so flattening is partial;
    # verified bit-identical against a scipy sosfiltfilt implementation of the
    # same math (ratio 1.902 vs 1.902)
    assert out_ratio < 0.6 * in_ratio


def test_otsu_bimodal(rng):
    lo = rng.normal(50, 5, 8000)
    hi = rng.normal(200, 10, 2000)
    img = np.concatenate([lo, hi]).astype(np.float32)
    t = stats.threshold_otsu(img)
    # brute-force maximization of the Otsu objective on this data gives 67.3
    assert 60 < t < 170


def test_multiotsu_trimodal(rng):
    a = rng.normal(30, 3, 6000)
    b = rng.normal(120, 5, 3000)
    c = rng.normal(220, 5, 1000)
    img = np.concatenate([a, b, c]).astype(np.float32)
    th = stats.threshold_multiotsu(img, classes=3)
    assert len(th) == 2
    assert 40 < th[0] < 110
    assert 130 < th[1] < 210


def test_hist_match(rng):
    import jax.numpy as jnp

    src = rng.normal(50, 5, (64, 64)).astype(np.float32)
    tmpl = rng.normal(200, 20, (64, 64)).astype(np.float32)
    out = np.asarray(it.hist_match(jnp.asarray(src), jnp.asarray(tmpl)))
    # matched distribution adopts the template's stats
    assert abs(out.mean() - tmpl.mean()) < 2.0
    assert abs(out.std() - tmpl.std()) < 2.0
    # rank order preserved
    flat_in = src.ravel()
    flat_out = out.ravel()
    idx = np.argsort(flat_in)
    assert (np.diff(flat_out[idx]) >= -1e-3).all()


def test_estimate_image_params(rng):
    base = rng.normal(80, 10, (128, 128))
    fg = rng.normal(8000, 500, (128, 128))
    mask = rng.random((128, 128)) < 0.1
    img = np.clip(np.where(mask, fg, base), 0, 65535).astype(np.uint16)
    dark, shift, cmin, cmed, cmax = stats.estimate_image_params([img, img, img])
    assert 0 <= shift <= 8
    # bright foreground ~8000-9500 -> needs shift 5-6 (256*2^5=8192)
    assert shift in (5, 6)
    assert 0 < dark < 8000
    assert cmin < cmed < cmax
