"""External-reader validation of our .ims files via the reference's OWN
supplements/croping.py, run VERBATIM with the REAL h5py.

This is the strongest Imaris interop evidence available in this
environment: the reference's read_ims walks the real HDF5 layout
(`DataSet/ResolutionLevel L/TimePoint 0/Channel C/Data`,
croping.py:70-93) with h5py.read_direct against a file written by
ipp_tpu.io.ims.write_imaris — no shims on the reader side.  Also pins
our crop_ims 8-bit companion to the reference's own
convert_16bit_to_8bit_fun (croping.py:23-39: plain shift + 255 clip,
deliberately no nonzero->1 mapping)."""

import sys

import numpy as np
import pytest

from ipp_tpu.io import tiff as tio
from ipp_tpu.io.ims import ImarisReader, write_imaris
from ipp_tpu.pipeline.tsv_tools import crop_ims
from tests.refshims import REF, install_shims

pytestmark = pytest.mark.skipif(
    not (REF / "supplements" / "croping.py").exists(),
    reason="reference croping.py unavailable")


@pytest.fixture(scope="module")
def ref_crop():
    install_shims()  # tifffile/PIL stand-ins; h5py + pandas are REAL
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import supplements.croping as rc  # noqa: PLC0415

    return rc


@pytest.fixture(scope="module")
def ims_volume(tmp_path_factory):
    rng = np.random.default_rng(7)
    vol = rng.integers(0, 65535, (12, 64, 48)).astype(np.uint16)
    path = tmp_path_factory.mktemp("ims") / "synth.ims"
    write_imaris(path, lambda z: vol[z], vol.shape, np.uint16,
                 voxel_um=(2.0, 1.0, 1.0), n_levels=2)
    return path, vol


def test_reference_read_ims_reads_our_file(ref_crop, ims_volume):
    """The reference's h5py ROI reader returns exactly the voxels we
    wrote, for both full-extent (-1) and bounded ROIs."""
    path, vol = ims_volume
    full = ref_crop.read_ims(path, (0, 0, 0))
    np.testing.assert_array_equal(full, vol)
    roi = ref_crop.read_ims(path, (3, 10, 8), zyx_extents=(5, 20, 16))
    np.testing.assert_array_equal(roi, vol[3:8, 10:30, 8:24])


def test_reference_read_ims_level1_matches_our_reader(ref_crop, ims_volume):
    """Resolution level 1 (the mean-pooled pyramid) reads back identically
    through the reference's reader and ours."""
    path, _ = ims_volume
    ref_lv1 = ref_crop.read_ims(path, (0, 0, 0), resolution_level=1)
    with ImarisReader(path, resolution_level=1) as r:
        ours_lv1 = r[0:len(r)]
    np.testing.assert_array_equal(ref_lv1, ours_lv1)


def test_reference_read_ims_error_paths(ref_crop, ims_volume):
    """The reference's validation raises on our file the same way it
    would on Imaris's own (missing level, bad channel)."""
    path, _ = ims_volume
    with pytest.raises(KeyError):
        ref_crop.read_ims(path, (0, 0, 0), resolution_level=9)
    with pytest.raises(ValueError):
        ref_crop.read_ims(path, (0, 0, 0), channel=3)


def test_crop_ims_matches_reference_crop(ref_crop, ims_volume, tmp_path):
    """crop_ims' 16-bit crop == the reference read_ims ROI; the 8-bit
    companion == its convert_16bit_to_8bit_fun."""
    path, vol = ims_volume
    p16 = crop_ims(path, tmp_path, 2, 9, 4, 40, 8, 40, right_shift=3)
    ref_roi = ref_crop.read_ims(path, (2, 4, 8), zyx_extents=(7, 36, 32))
    np.testing.assert_array_equal(tio.read_tiff_stack(p16), ref_roi)
    ref_8 = ref_crop.convert_16bit_to_8bit_fun(ref_roi.copy(),
                                               right_shift=3)
    p8 = p16.with_name(p16.name.replace("_16bit", "_8bit"))
    ours_8 = tio.read_tiff_stack(p8)
    assert ours_8.dtype == ref_8.dtype
    np.testing.assert_array_equal(ours_8, ref_8)


def test_crop_ims_golden_roi_fuzz(ref_crop, ims_volume, tmp_path):
    """Seeded ROI fuzz: random crop boxes and bit shifts through crop_ims
    vs the reference's read_ims + convert_16bit_to_8bit_fun
    (supplements/croping.py)."""
    path, vol = ims_volume
    r = np.random.default_rng(20260819)
    for i in range(6):
        z0 = int(r.integers(0, 8)); z1 = int(r.integers(z0 + 2, 13))
        y0 = int(r.integers(0, 40)); y1 = int(r.integers(y0 + 4, 65))
        x0 = int(r.integers(0, 32)); x1 = int(r.integers(x0 + 4, 49))
        shift = int(r.integers(0, 9))
        out = tmp_path / f"f{i}"
        out.mkdir()
        p16 = crop_ims(path, out, z0, z1, y0, y1, x0, x1,
                       right_shift=shift)
        ref_roi = ref_crop.read_ims(path, (z0, y0, x0),
                                    zyx_extents=(z1 - z0, y1 - y0,
                                                 x1 - x0))
        np.testing.assert_array_equal(tio.read_tiff_stack(p16), ref_roi)
        ref_8 = ref_crop.convert_16bit_to_8bit_fun(ref_roi.copy(),
                                                   right_shift=shift)
        p8 = p16.with_name(p16.name.replace("_16bit", "_8bit"))
        np.testing.assert_array_equal(tio.read_tiff_stack(p8), ref_8)
