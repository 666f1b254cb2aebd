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
