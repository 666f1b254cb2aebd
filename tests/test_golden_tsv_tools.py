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


def test_downsample_matches_reference(tmp_path, rng):
    """The reference's OWN tsv/downsample.py downsample() runs verbatim
    (skimage default SUM reducer + cast back to the input dtype,
    tsv/downsample.py:11-14) and pins downsample_series' per-plane math
    and name preservation."""
    install_shims()
    load_pystripe_core()
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    from tests.refshims import _shim_block_reduce
    import tsv.downsample as td

    td.block_reduce = _shim_block_reduce  # placeholder-proof (see ref_core)
    src = tmp_path / "src"
    src.mkdir()
    # values large enough that the SUM reducer wraps uint16 — the quirk
    # must match bit-for-bit, not just approximately
    for z in range(3):
        img = (rng.random((30, 34)) * 40000).astype(np.uint16)
        tio.imwrite(src / f"plane_{z:03d}.tif", img)

    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    for p in sorted(src.iterdir()):
        td.downsample(str(p), str(ref_dir / p.name), factor=2, compress=4)

    from ipp_tpu.pipeline.tsv_tools import downsample_series

    our_dir = tmp_path / "ours"
    n = downsample_series(src, our_dir, factor=2)
    assert n == 3
    ref_files = sorted(p.name for p in ref_dir.iterdir())
    our_files = sorted(p.name for p in our_dir.iterdir())
    assert ref_files == our_files
    for name in ref_files:
        a = tio.imread(ref_dir / name)
        b = tio.imread(our_dir / name)
        assert a.dtype == b.dtype == np.uint16
        np.testing.assert_array_equal(a, b)


def test_simple_stitch_matches_reference(tmp_path, rng):
    """The reference's OWN TSVSimpleVolume (tsv/volume.py:810-860) +
    convert_one_plane run verbatim on a SmartSPIM tree and pin our
    `tsv_tools simple` mode: nominal positions TRUNCATED relative to the
    first tile (int((x-x0)/vox/10)), max blending, same planes."""
    install_shims()
    load_pystripe_core()
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import tsv.convert as tc
    import tsv.volume as tv

    # non-integer pixel pitch so truncation != rounding
    vox_x, vox_y = 1.8, 1.8
    tile_h, tile_w, nz = 40, 48, 4
    root = tmp_path / "tree"
    # stage positions in tenths of micron; spacing 700 -> 700/10/1.8 =
    # 38.88 px: truncation gives 38, rounding would give 39
    xs_t = (12000, 12700)
    ys_t = (30000, 30650)
    base = (rng.random((nz, tile_h + 80, tile_w + 80)) * 900).astype(
        np.uint16)
    for x in xs_t:
        for y in ys_t:
            d = root / f"{x:06d}" / f"{x:06d}_{y:06d}"
            d.mkdir(parents=True)
            px = int((x - xs_t[0]) / vox_x / 10.0)
            py = int((y - ys_t[0]) / vox_y / 10.0)
            for z in range(nz):
                tio.imwrite(d / f"{z:04d}.tif",
                            base[z, py:py + tile_h, px:px + tile_w])

    ref_vol = tv.TSVSimpleVolume(str(root), vox_x, vox_y, 2.0)
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    for z in range(0, nz):
        tc.convert_one_plane(ref_vol, None, 1, np.uint16,
                             str(ref_dir / "img_{z:04d}.tif"),
                             ref_vol.volume, z, 0, False)

    from ipp_tpu.pipeline import tsv_tools

    our_dir = tmp_path / "ours"
    rc = tsv_tools.main([
        "simple", "--path", str(root),
        "--voxel-size-xy", str(vox_x), "--voxel-size-z", "2.0",
        "--output-pattern", str(our_dir / "img_{z:04d}.tif"),
        "--compression", "0"])
    assert rc == 0
    ref_files = sorted(p.name for p in ref_dir.iterdir())
    our_files = sorted(p.name for p in our_dir.iterdir())
    assert ref_files == our_files and len(ref_files) == nz
    for name in ref_files:
        a = tio.imread(ref_dir / name)
        b = tio.imread(our_dir / name)
        assert a.shape == b.shape
        # same tiles cut from one phantom at the truncated offsets: the
        # max-blend canvases agree except the reference's f16 rounding
        np.testing.assert_allclose(b.astype(np.float32),
                                   a.astype(np.float32), atol=4.0)


def _tree_listing(root):
    return sorted(str(p.relative_to(root)) for p in root.rglob("*"))


def test_renumber_tree_matches_reference(tmp_path, rng):
    """The reference's OWN tsv/renumber.py runs verbatim: plane names are
    zero-padded IN PLACE (index preserved, .tiff only)."""
    install_shims()
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import tsv.renumber as tr

    def make(root):
        for x, y in ((10, 20), (30, 20)):
            d = root / f"{x:06d}" / f"{x:06d}_{y:06d}"
            d.mkdir(parents=True)
            for z in (3, 12, 105):
                (d / f"{z}.tiff").write_bytes(b"x")
            (d / "notes.txt").write_bytes(b"y")  # untouched
        return root

    ref_root = make(tmp_path / "ref")
    our_root = make(tmp_path / "ours")
    tr.main(["--n-digits", "6", str(ref_root)])
    from ipp_tpu.pipeline.tsv_tools import renumber_tree

    assert renumber_tree(our_root, 6) == 6
    assert _tree_listing(ref_root) == _tree_listing(our_root)
    assert (our_root / "000010" / "000010_000020" / "000105.tiff").exists()


def test_renumber_directories_matches_reference(tmp_path):
    """The reference's OWN tsv/renumber_directories.py runs verbatim:
    negative stage coordinates shift positive by -min per axis."""
    install_shims()
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import tsv.renumber_directories as trd

    def make(root):
        for x in (-120, 0):
            for y in (-300, 150):
                d = root / f"{x:06d}" / f"{x:06d}_{y:06d}"
                d.mkdir(parents=True)
                (d / "0000.tif").write_bytes(b"x")
        return root

    ref_root = make(tmp_path / "ref")
    our_root = make(tmp_path / "ours")
    trd.main(["--path", str(ref_root)])
    from ipp_tpu.pipeline.tsv_tools import renumber_directories

    assert renumber_directories(our_root) > 0
    assert _tree_listing(ref_root) == _tree_listing(our_root)
    assert (our_root / "000120" / "000120_000450" / "0000.tif").exists()


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


def test_renumber_directories_y_shift_collision_safe(tmp_path):
    """min_x == 0 with negative y: shifting y upward renames onto sibling
    names that exist before their own rename — descending-y order makes
    this safe (the reference renames in set order and can collide;
    documented fix)."""
    from ipp_tpu.pipeline.tsv_tools import renumber_directories

    root = tmp_path / "tree"
    for y in (-300, 0, 300):
        d = root / "000000" / f"000000_{y:06d}"
        d.mkdir(parents=True)
        (d / "data.tif").write_bytes(str(y).encode())
    assert renumber_directories(root) == 3
    for old_y, new_y in ((-300, 0), (0, 300), (300, 600)):
        p = root / "000000" / f"000000_{new_y:06d}" / "data.tif"
        assert p.read_bytes() == str(old_y).encode()
