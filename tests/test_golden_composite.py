"""Golden cross-validation of the channel composite writer against the
reference's OWN process_images.generate_composite_image, run VERBATIM.

Covers the channel-count semantics the reference encodes
(process_images.py:860-906): 2 channels -> third plane zeroed, 3 channels
-> dstack in input order, 4 channels -> CMYK order; plus the
right_bit_shifts per-channel 8-bit conversion (:878-879) and the
zeros-fill of planes a shorter channel is missing (:883-885).
Transformation matrices are identity (translation < 1 px), so the
reference takes its correct_shape path — the ECC/warp path is covered by
tests/test_golden_align.py.
"""

import sys

import numpy as np
import pytest

from ipp_tpu.io import tiff as tio
from ipp_tpu.pipeline.align_channels import write_composite_series
from tests.refshims import (REF, install_process_images_shims,
                            install_shims, load_pystripe_core)

pytestmark = pytest.mark.skipif(
    not (REF / "process_images.py").exists(),
    reason="reference process_images unavailable")


@pytest.fixture(scope="module")
def ref_pi():
    install_shims()
    core = load_pystripe_core()
    # imread_tif_raw_png goes through imageio's tifffile plugin, which
    # needs the real tifffile package; route it to our codec instead
    core.iio_imread = lambda p, **kw: np.asarray(tio.imread(p))
    install_process_images_shims()
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import process_images as rp  # noqa: PLC0415

    return rp


@pytest.fixture
def rng():
    return np.random.default_rng(20260818)


def _write_channel(d, rng, nz, shape=(24, 32), dtype=np.uint16):
    d.mkdir(parents=True)
    info = np.iinfo(dtype)
    for z in range(nz):
        img = rng.integers(0, info.max, size=shape).astype(dtype)
        tio.imwrite(d / f"img_{z:04d}.tif", img)
    return d


def _run_reference(ref_pi, chan_dirs, out_dir, order_of_colors,
                   right_bit_shifts=None):
    from supplements.tifstack import TifStack  # noqa: PLC0415

    stacks = [TifStack(d, 0) for d in chan_dirs]
    mats = [np.eye(2, 3, dtype=np.float32)] * (len(stacks) - 1)
    out_dir.mkdir(parents=True, exist_ok=True)
    for z in range(stacks[0].nz):
        ref_pi.generate_composite_image(
            z, stacks, mats, order_of_colors, out_dir, resume=False,
            compression=None, right_bit_shifts=right_bit_shifts)
    return sorted(out_dir.glob("*.tif"))


def _compare(ref_files, our_dir, nz):
    our_files = sorted(our_dir.glob("*.tif"))
    assert len(ref_files) == nz and len(our_files) == nz
    for rf, of in zip(ref_files, our_files):
        ref = tio.imread(rf)
        ours = tio.imread(of)
        assert ref.dtype == ours.dtype
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(ours))


def test_three_channel_rgb_matches_reference(ref_pi, tmp_path, rng):
    """3 channels dstack in input order; u16 passthrough (no conversion)."""
    dirs = [_write_channel(tmp_path / f"ch{i}", rng, nz=3)
            for i in range(3)]
    ref_files = _run_reference(ref_pi, dirs, tmp_path / "ref", "rgb")
    our = write_composite_series(
        {f"ch{i}": d for i, d in enumerate(dirs)},
        {"ch0": "r", "ch1": "g", "ch2": "b"},
        tmp_path / "ours", dtype=np.uint16)
    _compare(ref_files, our, 3)


def test_two_channel_zero_fills_third_plane(ref_pi, tmp_path, rng):
    """2 channels -> the reference appends a zeros third plane; a SHORTER
    second channel zero-fills its missing z planes (TifStack returns None
    past its end -> zeros, process_images.py:883-885)."""
    d0 = _write_channel(tmp_path / "ch0", rng, nz=4)
    d1 = _write_channel(tmp_path / "ch1", rng, nz=2)
    ref_files = _run_reference(ref_pi, [d0, d1], tmp_path / "ref", "rgb")
    our = write_composite_series(
        {"ch0": d0, "ch1": d1}, {"ch0": "r", "ch1": "g"},
        tmp_path / "ours", dtype=np.uint16)
    _compare(ref_files, our, 4)


def test_four_channel_cmyk_matches_reference(ref_pi, tmp_path, rng):
    """4 channels -> CMYK plane order (the merge_channels.py CLI builds
    order_of_colors in cmyk order, merge_channels.py:76-90)."""
    dirs = [_write_channel(tmp_path / f"ch{i}", rng, nz=2)
            for i in range(4)]
    ref_files = _run_reference(ref_pi, dirs, tmp_path / "ref", "cmyk")
    our = write_composite_series(
        {f"ch{i}": d for i, d in enumerate(dirs)},
        {"ch0": "c", "ch1": "m", "ch2": "y", "ch3": "k"},
        tmp_path / "ours", dtype=np.uint16)
    _compare(ref_files, our, 2)


def test_right_bit_shifts_match_reference(ref_pi, tmp_path, rng):
    """Per-channel 8-bit conversion before compositing (bit shifts differ
    per channel; output dtype u8)."""
    dirs = [_write_channel(tmp_path / f"ch{i}", rng, nz=2)
            for i in range(3)]
    shifts = (8, 5, 3)
    ref_files = _run_reference(ref_pi, dirs, tmp_path / "ref", "rgb",
                               right_bit_shifts=shifts)
    our = write_composite_series(
        {f"ch{i}": d for i, d in enumerate(dirs)},
        {"ch0": "r", "ch1": "g", "ch2": "b"},
        tmp_path / "ours",
        right_bit_shifts={f"ch{i}": s for i, s in enumerate(shifts)})
    _compare(ref_files, our, 2)


def test_mixed_color_spaces_rejected(tmp_path, rng):
    d0 = _write_channel(tmp_path / "ch0", rng, nz=1)
    d1 = _write_channel(tmp_path / "ch1", rng, nz=1)
    with pytest.raises(ValueError, match="mix"):
        write_composite_series({"ch0": d0, "ch1": d1},
                               {"ch0": "r", "ch1": "k"},
                               tmp_path / "ours")


def test_three_channel_cmy_matches_reference(ref_pi, tmp_path, rng):
    """3 CMYK-space channels -> the reference emits THREE planes
    (available_colors = order_of_colors[:3], process_images.py:894-898);
    ours matches (4 planes only when a key channel exists)."""
    dirs = [_write_channel(tmp_path / f"ch{i}", rng, nz=2)
            for i in range(3)]
    ref_files = _run_reference(ref_pi, dirs, tmp_path / "ref", "cmyk")
    our = write_composite_series(
        {f"ch{i}": d for i, d in enumerate(dirs)},
        {"ch0": "c", "ch1": "m", "ch2": "y"},
        tmp_path / "ours", dtype=np.uint16)
    _compare(ref_files, our, 2)
    assert tio.imread(sorted(our.glob("*.tif"))[0]).shape[-1] == 3


def test_partial_bit_shifts_rejected(tmp_path, rng):
    d0 = _write_channel(tmp_path / "c0", rng, nz=1)
    d1 = _write_channel(tmp_path / "c1", rng, nz=1)
    with pytest.raises(ValueError, match="cover every channel"):
        write_composite_series({"c0": d0, "c1": d1},
                               {"c0": "r", "c1": "g"}, tmp_path / "o",
                               right_bit_shifts={"c0": 8})
