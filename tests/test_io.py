import numpy as np
import pytest

from ipp_tpu.io import tiff as tio
from ipp_tpu.io import raw as rio


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
@pytest.mark.parametrize("compression", [None, "zlib"])
def test_tiff_roundtrip(tmp_path, rng, dtype, compression):
    if np.issubdtype(dtype, np.integer):
        img = rng.integers(0, np.iinfo(dtype).max, (100, 130)).astype(dtype)
    else:
        img = rng.standard_normal((100, 130)).astype(dtype)
    p = tmp_path / "x.tif"
    tio.imwrite(p, img, compression=compression)
    out = tio.imread(p)
    np.testing.assert_array_equal(out, img)


def test_tiff_pil_interop(tmp_path, rng):
    """Files we write must be readable by PIL and vice versa."""
    from PIL import Image

    img = rng.integers(0, 65535, (64, 80)).astype(np.uint16)
    p = tmp_path / "ours.tif"
    tio.imwrite(p, img)
    with Image.open(p) as im:
        np.testing.assert_array_equal(np.asarray(im), img)

    p2 = tmp_path / "pil.tif"
    Image.fromarray(img).save(p2)
    np.testing.assert_array_equal(tio.imread(p2), img)


def test_tiff_rgb_roundtrip(tmp_path, rng):
    img = rng.integers(0, 255, (33, 47, 3)).astype(np.uint8)
    p = tmp_path / "rgb.tif"
    tio.imwrite(p, img)
    np.testing.assert_array_equal(tio.imread(p), img)


def test_tiff_atomic_no_partial(tmp_path, rng):
    img = rng.integers(0, 65535, (32, 32)).astype(np.uint16)
    p = tmp_path / "a.tif"
    tio.imwrite(p, img)
    assert not (tmp_path / "a.tif.tmp").exists()


def test_tiff_multi_strip(tmp_path, rng):
    img = rng.integers(0, 65535, (600, 700)).astype(np.uint16)
    p = tmp_path / "big.tif"
    tio.write_tiff(p, img, rows_per_strip=37, compression="zlib")
    np.testing.assert_array_equal(tio.read_tiff(p), img)


def test_bigtiff_roundtrip(tmp_path, rng):
    img = rng.integers(0, 65535, (128, 200)).astype(np.uint16)
    p = tmp_path / "bt.tif"
    tio.write_tiff(p, img, bigtiff=True)
    np.testing.assert_array_equal(tio.read_tiff(p), img)


def test_raw_roundtrip(tmp_path, rng):
    img = rng.integers(0, 65535, (55, 77)).astype(np.uint16)
    p = tmp_path / "x.raw"
    rio.raw_imsave(p, img)
    out = rio.raw_imread(p)
    np.testing.assert_array_equal(np.asarray(out), img)
