"""Golden cross-validation of the merge/blend path against the reference's
own TSV code (tsv/volume.py:430-647) — the step-6 analog of
test_golden_terastitcher.py.

Our stitch steps 2-5 place a synthetic jittered grid; the placement XML
(TeraStitcher schema) is handed to the reference's REAL TSVVolume, whose
blending math (get_distance_from_edge / compute_cosine / imread) then
reads the same tiles — the reference module runs verbatim from
/root/reference with only its missing third-party imports shimmed
(numexpr.evaluate -> numpy eval; tifffile -> ipp_tpu.io.tiff;
pystripe.core.glob_re -> re-based rglob).  Our PlaneBlender must
reproduce the reference's blended planes.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

from ipp_tpu.geometry.extent import VExtent as OurExtent
from ipp_tpu.io import tiff as tio
from ipp_tpu.stitch.align import compute_displacements
from ipp_tpu.stitch.blend import PlaneBlender
from ipp_tpu.stitch.place import (place_tiles_mst, project_displacements,
                                  threshold_displacements)
from tests.synth import cut_tiles, make_phantom, write_tile_grid

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not (REF / "tsv" / "volume.py").exists(),
                                reason="reference tsv unavailable")


def _load_reference_tsv():
    """Import the reference's tsv.volume verbatim via the shared shim
    registry (tests/refshims): the real pystripe.core supplies glob_re,
    tifffile routes to ipp_tpu.io.tiff, numexpr evaluates over numpy."""
    if "tsv.volume" in sys.modules:
        import tsv.volume as tv

        return tv

    from tests.refshims import load_pystripe_core

    load_pystripe_core()  # installs shims + real pystripe package
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import tsv.volume as tv

    return tv


@pytest.fixture(scope="module")
def placed_grid(tmp_path_factory):
    rng = np.random.default_rng(11)
    tmp_path = tmp_path_factory.mktemp("tsvgold")
    vol = make_phantom(rng, (8, 420, 420), smooth=8.0)
    tiles, offsets = cut_tiles(vol, 3, 3, (160, 160), 48, jitter=4, rng=rng)
    grid = write_tile_grid(tmp_path / "ch", tiles, overlap_nominal_px=48)
    cands = compute_displacements(grid, overlap_v=48, overlap_h=48,
                                  displ_max_v=10, displ_max_h=10,
                                  displ_max_d=2, subvol_dim=8)
    project_displacements(grid, cands, 48, 48)
    threshold_displacements(grid, reliability_threshold=0.6)
    place_tiles_mst(grid)
    xml_path = tmp_path / "placement.xml"
    grid.to_xml(xml_path)
    return grid, xml_path


@pytest.mark.filterwarnings("ignore::RuntimeWarning")  # the REFERENCE's
# f16 cosine accumulation overflows in its divide (tsv/volume.py:626)
@pytest.mark.parametrize("cosine", [True, False])
def test_blend_matches_reference_tsv(placed_grid, cosine):
    grid, xml_path = placed_grid
    tv = _load_reference_tsv()
    ref_vol = tv.TSVVolume(str(xml_path), cosine_blending=cosine)
    bbox = ref_vol.volume

    stacks = grid.flattened()
    blender = PlaneBlender([s.extent for s in stacks], cosine=cosine)
    our_bbox = grid.volume
    # same global frame: the reference rebases to its own min corner
    assert (bbox.x1 - bbox.x0, bbox.y1 - bbox.y0) == \
        (our_bbox.x1 - our_bbox.x0, our_bbox.y1 - our_bbox.y0)

    for z in (0, 3, 7):
        ref_plane = ref_vol.imread(
            tv.VExtent(bbox.x0, bbox.x1, bbox.y0, bbox.y1, z, z + 1),
            np.float32)[0]
        ours = blender.blend_plane(
            OurExtent(our_bbox.x0, our_bbox.x1, our_bbox.y0, our_bbox.y1,
                      z, z + 1),
            lambda i, e: stacks[i].imread(e), dtype=np.float32)
        # identical blending math; the reference accumulates u16 input in
        # FLOAT16 (tsv/volume.py:594-600 'template = float16') while we
        # accumulate in f32 — a documented precision improvement, so the
        # agreement bound is the reference's own f16 rounding (2^-11
        # relative, up to 2 ulp where its f16 divide saturates — the
        # RuntimeWarning: overflow in divide comes from the REFERENCE)
        np.testing.assert_allclose(ours, ref_plane, atol=4.0, rtol=4e-3)


@pytest.mark.filterwarnings("ignore::RuntimeWarning")  # reference f16 divide
def test_convert_planes_match_reference_tsv_convert(placed_grid, tmp_path):
    """The reference's OWN tsv/convert.py convert_one_plane runs verbatim
    (mipmap decimation + rotation + sub-volume, tsv/convert.py:116-163)
    and pins `tsv_tools.convert_xml_to_2d_tif`: same absolute-z file
    names, same decimate-THEN-rotate order, same blended pixels (within
    the reference's f16 accumulation rounding)."""
    grid, xml_path = placed_grid
    tv = _load_reference_tsv()
    import tsv.convert as tc

    ref_vol = tv.TSVVolume(str(xml_path), cosine_blending=True)
    bbox = ref_vol.volume
    our_bbox = grid.volume

    # identical sub-extent expressed in each frame's own origin
    rx0, ry0, rz = bbox.x0 + 8, bbox.y0 + 4, bbox.z0 + 1
    ref_sub = tv.VExtent(rx0, rx0 + 96, ry0, ry0 + 96, rz, rz + 6)
    ox0, oy0, oz = our_bbox.x0 + 8, our_bbox.y0 + 4, our_bbox.z0 + 1
    vol_str = f"{ox0},{ox0 + 96},{oy0},{oy0 + 96},{oz},{oz + 6}"

    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    for z in range(ref_sub.z0, ref_sub.z1, 2):  # mipmap_level=1
        tc.convert_one_plane(ref_vol, None, 2, np.uint16,
                             str(ref_dir / "img_{z:04d}.tif"), ref_sub, z,
                             90, False)

    from ipp_tpu.io import tiff as tio
    from ipp_tpu.pipeline.tsv_tools import convert_xml_to_2d_tif

    our_dir = tmp_path / "ours"
    convert_xml_to_2d_tif(
        xml_path, str(our_dir / "img_{z:04d}.tif"), mipmap_level=1,
        volume_str=vol_str, compression=0, rotation=90, cosine=True)

    ref_planes = sorted(ref_dir.glob("img_*.tif"))
    our_planes = sorted(our_dir.glob("img_*.tif"))
    # identical absolute-z names once each frame's z origin is removed
    assert [p.name for p in ref_planes] == \
        [f"img_{int(q.stem.split('_')[1]) - oz + rz:04d}.tif"
         for q in our_planes]
    assert len(ref_planes) == 3
    for rp, op in zip(ref_planes, our_planes):
        ref_img = tio.imread(rp)
        our_img = tio.imread(op)
        assert ref_img.shape == our_img.shape == (48, 48)
        # reference accumulates in f16 (tsv/volume.py:594-600); bound is
        # its rounding, as in test_blend_matches_reference_tsv
        np.testing.assert_allclose(our_img.astype(np.float32),
                                   ref_img.astype(np.float32),
                                   atol=4.0, rtol=4e-3)


def test_diag_plane_matches_reference(tmp_path, rng):
    """The reference's OWN make_diag_plane (tsv/convert.py:268-280 +
    TSVVolume.make_diagnostic_img, tsv/volume.py:649-668) vs our
    make_diag_stack on a 1x3 grid, where both render each intersecting
    stack into its own RGB channel in row-major order.  (On >3
    intersecting stacks the reference silently DROPS channels 4+ while
    ours cycles mod 3 — a documented deviation, so the golden pins the
    <=3 case.)"""
    tv = _load_reference_tsv()
    import tsv.convert as tc

    vol = make_phantom(rng, (4, 140, 400), smooth=8.0)
    tiles, _ = cut_tiles(vol, 1, 3, (120, 150), 40, jitter=2, rng=rng)
    grid = write_tile_grid(tmp_path / "ch", tiles, overlap_nominal_px=40)
    cands = compute_displacements(grid, overlap_v=40, overlap_h=40,
                                  displ_max_v=6, displ_max_h=6,
                                  displ_max_d=2, subvol_dim=4)
    project_displacements(grid, cands, 40, 40)
    threshold_displacements(grid, reliability_threshold=0.6)
    place_tiles_mst(grid)
    xml_path = tmp_path / "placement.xml"
    grid.to_xml(xml_path)

    ref_vol = tv.TSVVolume(str(xml_path))
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    volume = ref_vol.volume
    for z in range(volume.z0, volume.z1):
        tc.make_diag_plane(ref_vol, 4, 1, np.uint16, None,
                           str(ref_dir / "d_{z:04d}.tif"), volume, z)

    from ipp_tpu.stitch.merge import make_diag_stack

    our_dir = make_diag_stack(grid, tmp_path / "ours", dtype=np.uint16)
    ref_files = sorted(ref_dir.glob("*.tif"))
    our_files = sorted(Path(our_dir).glob("*.tif"))
    assert len(ref_files) == len(our_files) == 4
    for rf, of in zip(ref_files, our_files):
        a = np.asarray(tio.imread(rf))
        b = np.asarray(tio.imread(of))
        assert a.shape == b.shape and a.shape[2] == 3
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# seeded grid fuzz: random grid dims / tile shapes / overlaps / jitter /
# z-stagger placed at TRUE offsets (no NCC in the loop) — the reference's
# TSVVolume blends the same placement XML verbatim and every plane must
# match.  Exercises the ragged tile-plane intersections and the cosine
# distance-from-edge math (tsv/volume.py:430-647) across geometries the
# single 3x3 fixture cannot reach.
# ---------------------------------------------------------------------------


def _merge_fuzz_configs(n=4, seed=20260819):
    r = np.random.default_rng(seed)
    cfgs = []
    for _ in range(n):
        cfgs.append((
            int(r.integers(2, 5)),              # rows
            int(r.integers(2, 4)),              # cols
            (int(r.integers(96, 177)),          # tile h
             int(r.integers(96, 177))),         # tile w
            int(r.integers(24, 49)),            # overlap
            int(r.integers(0, 6)),              # xy jitter
            int(r.integers(0, 2)),              # z stagger max
            bool(r.integers(0, 2)),             # cosine blending
        ))
    return cfgs


@pytest.mark.filterwarnings("ignore::RuntimeWarning")  # reference f16 divide
@pytest.mark.parametrize("rows,cols,tile,ov,jit,zmax,cosine",
                         _merge_fuzz_configs())
def test_blend_golden_fuzz(tmp_path, rows, cols, tile, ov, jit, zmax,
                           cosine):
    rng = np.random.default_rng(hash((rows, cols, ov)) % 2 ** 31)
    th, tw = tile
    depth = 6
    H = (rows - 1) * (th - ov) + th + 2 * jit + 4
    W = (cols - 1) * (tw - ov) + tw + 2 * jit + 4
    vol = make_phantom(rng, (depth + zmax, H, W), smooth=7.0)
    tiles, offsets = cut_tiles(vol, rows, cols, tile, ov, jitter=jit,
                               rng=rng)
    zoffs = [[int(rng.integers(0, zmax + 1)) for _ in range(cols)]
             for _ in range(rows)]
    tiles = [[tiles[r][c][zoffs[r][c]:zoffs[r][c] + depth]
              for c in range(cols)] for r in range(rows)]
    grid = write_tile_grid(tmp_path / "ch", tiles, overlap_nominal_px=ov)
    from ipp_tpu.geometry.stacks import Displacement

    def truth(r, c):
        return (offsets[r][c][0], offsets[r][c][1], zoffs[r][c])

    for r in range(rows):
        for c in range(cols):
            st = grid.stacks[r][c]
            st.abs_h, st.abs_v, st.abs_d = truth(r, c)
            # the reference's TSVVolume chains NORTH/WEST displacement
            # records (tsv/volume.py:748-771: offset = prev - displ), so
            # emit them from the true offsets
            if r > 0:
                px, py, pz = truth(r - 1, c)
                x, y, z = truth(r, c)
                st.north = Displacement(displ=(py - y, px - x, pz - z),
                                        reliability=(1.0, 1.0, 1.0))
            if c > 0:
                px, py, pz = truth(r, c - 1)
                x, y, z = truth(r, c)
                st.west = Displacement(displ=(py - y, px - x, pz - z),
                                       reliability=(1.0, 1.0, 1.0))
    xml_path = tmp_path / "placement.xml"
    grid.to_xml(xml_path)

    tv = _load_reference_tsv()
    ref_vol = tv.TSVVolume(str(xml_path), cosine_blending=cosine)
    bbox = ref_vol.volume
    stacks = grid.flattened()
    blender = PlaneBlender([s.extent for s in stacks], cosine=cosine)
    our_bbox = grid.volume
    assert (bbox.x1 - bbox.x0, bbox.y1 - bbox.y0) == \
        (our_bbox.x1 - our_bbox.x0, our_bbox.y1 - our_bbox.y0)
    zs = sorted({0, depth // 2, depth + zmax - 1})
    for z in zs:
        ref_plane = ref_vol.imread(
            tv.VExtent(bbox.x0, bbox.x1, bbox.y0, bbox.y1,
                       bbox.z0 + z, bbox.z0 + z + 1), np.float32)[0]
        ours = blender.blend_plane(
            OurExtent(our_bbox.x0, our_bbox.x1, our_bbox.y0, our_bbox.y1,
                      our_bbox.z0 + z, our_bbox.z0 + z + 1),
            lambda i, e: stacks[i].imread(e), dtype=np.float32)
        np.testing.assert_allclose(ours, ref_plane, atol=4.0, rtol=4e-3)
