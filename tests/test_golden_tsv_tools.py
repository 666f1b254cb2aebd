"""Golden cross-validation of fill_blanks_tree against the reference's
OWN tsv/fill_blanks.py run verbatim.

The tool decides which acquisition gaps get zero tiles (the planes the
stitcher would otherwise trip over); pin the coordinate discovery
(top-level X dirs, "X_Y" dirs, z-from-filename), the dest-tree layout,
and the full-product fill by executing the reference main, not
re-derived expectations.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

from tests.refshims import REF, install_shims, load_pystripe_core

from ipp_tpu.io import tiff as tio
from ipp_tpu.pipeline.tsv_tools import fill_blanks_tree

pytestmark = pytest.mark.skipif(
    not (REF / "tsv" / "fill_blanks.py").exists(),
    reason="reference tsv unavailable")


def _make_tree(root, rng, missing):
    """Two-level microscope tree with some (x, y, z) planes absent."""
    xs, ys, zs = (104, 207), (310, 415), (0, 1, 2)
    for x in xs:
        for y in ys:
            d = root / f"{x:06d}" / f"{x:06d}_{y:06d}"
            d.mkdir(parents=True)
            for z in zs:
                if (x, y, z) in missing:
                    continue
                img = (rng.random((12, 16)) * 500).astype(np.uint16)
                tio.imwrite(d / f"{z:04d}.tif", img)
    return xs, ys, zs


@pytest.fixture(scope="module")
def ref_fill_blanks():
    install_shims()
    load_pystripe_core()  # registers the real tsv package path + shims
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import tsv.fill_blanks as fb

    return fb


def test_fill_blanks_tree_matches_reference(ref_fill_blanks, tmp_path, rng):
    missing = {(104, 415, 1), (207, 310, 0), (207, 310, 2)}
    src_ref = tmp_path / "ref_src"
    src_our = tmp_path / "our_src"
    _make_tree(src_ref, np.random.default_rng(3), missing)
    _make_tree(src_our, np.random.default_rng(3), missing)

    # both run in "fill into the partially-populated dest" mode: a couple
    # of already-destriped planes exist and must be left alone
    for src in (src_ref, src_our):
        dest = src.parent / (src.name + "_destriped")
        d = dest / "000104" / "000104_000310"
        d.mkdir(parents=True)
        tio.imwrite(d / "0000.tif", np.full((12, 16), 7, np.uint16))

    ref_fill_blanks.main(["--src", str(src_ref), "--silent"])
    n = fill_blanks_tree(src_our, silent=True)

    ref_dest = tmp_path / "ref_src_destriped"
    our_dest = tmp_path / "our_src_destriped"
    ref_files = sorted(p.relative_to(ref_dest)
                       for p in ref_dest.rglob("*.tif"))
    our_files = sorted(p.relative_to(our_dest)
                       for p in our_dest.rglob("*.tif"))
    assert ref_files == our_files
    # full product (2x2x3) minus the one pre-existing plane
    assert n == 2 * 2 * 3 - 1
    for rel in ref_files:
        a = tio.imread(ref_dest / rel)
        b = tio.imread(our_dest / rel)
        np.testing.assert_array_equal(a, b)
        assert a.dtype == b.dtype == np.uint16
    # the pre-existing plane was preserved, every other plane is blank
    kept = tio.imread(our_dest / "000104" / "000104_000310" / "0000.tif")
    assert (kept == 7).all()
    blank = tio.imread(our_dest / "000104" / "000104_000310" / "0001.tif")
    assert not blank.any() and blank.shape == (12, 16)
