"""Golden cross-validation against the actual TeraStitcher binary.

The reference repo vendors Linux builds of terastitcher; when one runs on
this host, execute its steps 1-3 on a synthetic jittered grid and require
our step-2/3 pipeline to reproduce its projected displacements EXACTLY
(integer displ per axis) and its NCC peaks to 3 decimals.

This pins the whole chain — MIPs, all-shifts NCC, peak refinement, width,
per-axis fusion, nominal-offset addition, mirroring, z-chunk projection —
to the reference implementation.
"""

import shutil
import subprocess
from pathlib import Path
from xml.etree import ElementTree as ET

import numpy as np
import pytest

from tests.synth import cut_tiles, make_phantom, write_tile_grid

TS_BIN = Path("/root/reference/TeraStitcher/Linux/SSE2/terastitcher")


def _binary_runs() -> bool:
    if not TS_BIN.exists():
        return False
    try:
        out = subprocess.run([str(TS_BIN), "--version"], capture_output=True,
                             timeout=30)
        return out.returncode == 0
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _binary_runs(),
                                reason="terastitcher binary unavailable")


def test_displacements_match_reference_binary(tmp_path, rng):
    vol = make_phantom(rng, (20, 420, 420), smooth=8.0)
    tiles, offsets = cut_tiles(vol, 3, 3, (160, 160), 48, jitter=5, rng=rng)
    raw = tmp_path / "raw"
    raw.mkdir()
    grid = write_tile_grid(raw, tiles, overlap_nominal_px=48)

    def ts(*args):
        subprocess.run([str(TS_BIN), *args, "--noprogressbar"], check=True,
                       capture_output=True, timeout=600)

    xi = tmp_path / "xi.xml"
    xd = tmp_path / "xd.xml"
    xp = tmp_path / "xp.xml"
    # SmartSPIM x-first dir naming needs ref1=H ref2=V
    # (reference process_images.py:464-466)
    ts("-1", f"--volin={raw}", "--ref1=H", "--ref2=V", "--ref3=D",
       "--vxl1=1", "--vxl2=1", "--vxl3=1", f"--projout={xi}")
    ts("-2", f"--projin={xi}", f"--projout={xd}", "--oV=48", "--oH=48",
       "--sV=12", "--sH=12", "--sD=5", "--subvoldim=20")
    ts("-3", f"--projin={xd}", f"--projout={xp}")

    from ipp_tpu.stitch.align import compute_displacements
    from ipp_tpu.stitch.place import project_displacements

    cands = compute_displacements(grid, overlap_v=48, overlap_h=48,
                                  displ_max_v=12, displ_max_h=12,
                                  displ_max_d=5, subvol_dim=20)
    project_displacements(grid, cands, 48, 48)

    root = ET.parse(xp).getroot()
    n_checked = 0
    for st in root.iter("Stack"):
        r, c = int(st.get("ROW")), int(st.get("COL"))
        for side, tag in (("north", "NORTH_displacements"),
                          ("west", "WEST_displacements")):
            el = st.find(tag)
            d = el.find("Displacement") if el is not None else None
            if d is None:
                continue
            mine = getattr(grid.stacks[r][c], side)
            assert mine is not None, (r, c, side)
            for i, ax in enumerate("VHD"):
                a = d.find(ax)
                ref_displ = int(a.get("displ"))
                ref_peak = float(a.get("nccPeak"))
                assert mine.displ[i] == ref_displ, (r, c, side, ax)
                assert abs(mine.ncc_peak[i] - ref_peak) < 2e-3, (r, c, side, ax)
                n_checked += 1
    assert n_checked >= 36  # 12 links x 3 axes


def test_our_xml_drives_reference_steps_4_5(tmp_path, rng):
    """Reverse interop: an XML written by our step 2-3 pipeline must be
    consumable by the reference binary's steps 4 (threshold) and 5 (place),
    and its placement must match ours."""
    vol = make_phantom(rng, (12, 300, 300), smooth=8.0)
    tiles, offsets = cut_tiles(vol, 2, 2, (128, 128), 48, jitter=4, rng=rng)
    raw = tmp_path / "raw"
    raw.mkdir()
    grid = write_tile_grid(raw, tiles, overlap_nominal_px=48)

    from ipp_tpu.stitch.align import compute_displacements
    from ipp_tpu.stitch.place import (place_tiles_mst, project_displacements,
                                      threshold_displacements)

    cands = compute_displacements(grid, 48, 48, displ_max_v=8, displ_max_h=8,
                                  displ_max_d=3, subvol_dim=12)
    project_displacements(grid, cands, 48, 48)
    ours_xml = tmp_path / "ours.xml"
    grid.to_xml(ours_xml)

    thr = tmp_path / "thr.xml"
    placed = tmp_path / "placed.xml"
    subprocess.run([str(TS_BIN), "-4", f"--projin={ours_xml}",
                    f"--projout={thr}", "--threshold=0.6", "--noprogressbar"],
                   check=True, capture_output=True, timeout=300)
    subprocess.run([str(TS_BIN), "-5", f"--projin={thr}",
                    f"--projout={placed}", "--noprogressbar"],
                   check=True, capture_output=True, timeout=300)

    # our own steps 4-5 on the same displacements
    threshold_displacements(grid, 0.6)
    place_tiles_mst(grid)
    root = ET.parse(placed).getroot()
    ref_pos = {}
    for st in root.iter("Stack"):
        ref_pos[(int(st.get("ROW")), int(st.get("COL")))] = (
            int(st.get("ABS_V")), int(st.get("ABS_H")), int(st.get("ABS_D")))
    deltas = set()
    for (r, c), (v, h, d) in ref_pos.items():
        s = grid.stacks[r][c]
        deltas.add((v - s.abs_v, h - s.abs_h, d - s.abs_d))
    # identical up to one global shift
    assert len(deltas) == 1, deltas


@pytest.mark.parametrize("rows,cols,tile,ov,sv,sh,sd,svd,jit", [
    (2, 3, (144, 160), 40, 8, 8, 3, 16, 4),
    (3, 2, (176, 144), 56, 16, 16, 4, 24, 6),
    (2, 2, (160, 160), 48, 12, 16, 5, 12, 3),
])
def test_displacements_match_binary_fuzz(tmp_path, rng, rows, cols, tile,
                                         ov, sv, sh, sd, svd, jit):
    """Binary-parity fuzz: other grid dims / overlaps / search radii /
    subvolume depths than the 3x3 preset — our step-2 displacements and
    NCC peaks must still match the vendored terastitcher exactly."""
    th, tw = tile
    depth = max(20, svd)
    H = (rows - 1) * (th - ov) + th + 2 * jit + 4
    W = (cols - 1) * (tw - ov) + tw + 2 * jit + 4
    vol = make_phantom(rng, (depth, H, W), smooth=8.0)
    tiles, _ = cut_tiles(vol, rows, cols, tile, ov, jitter=jit, rng=rng)
    raw = tmp_path / "raw"
    raw.mkdir()
    grid = write_tile_grid(raw, tiles, overlap_nominal_px=ov)

    def ts(*args):
        subprocess.run([str(TS_BIN), *args, "--noprogressbar"], check=True,
                       capture_output=True, timeout=600)

    xi, xd, xp = (tmp_path / n for n in ("xi.xml", "xd.xml", "xp.xml"))
    ts("-1", f"--volin={raw}", "--ref1=H", "--ref2=V", "--ref3=D",
       "--vxl1=1", "--vxl2=1", "--vxl3=1", f"--projout={xi}")
    ts("-2", f"--projin={xi}", f"--projout={xd}", f"--oV={ov}",
       f"--oH={ov}", f"--sV={sv}", f"--sH={sh}", f"--sD={sd}",
       f"--subvoldim={svd}")
    ts("-3", f"--projin={xd}", f"--projout={xp}")

    from ipp_tpu.stitch.align import compute_displacements
    from ipp_tpu.stitch.place import project_displacements

    cands = compute_displacements(grid, overlap_v=ov, overlap_h=ov,
                                  displ_max_v=sv, displ_max_h=sh,
                                  displ_max_d=sd, subvol_dim=svd)
    project_displacements(grid, cands, ov, ov)

    root = ET.parse(xp).getroot()
    n_checked = 0
    for st in root.iter("Stack"):
        r, c = int(st.get("ROW")), int(st.get("COL"))
        for side, tag in (("north", "NORTH_displacements"),
                          ("west", "WEST_displacements")):
            el = st.find(tag)
            d = el.find("Displacement") if el is not None else None
            if d is None:
                continue
            mine = getattr(grid.stacks[r][c], side)
            assert mine is not None, (r, c, side)
            for i, ax in enumerate("VHD"):
                a = d.find(ax)
                # displacement (the argmax) must be EXACT; the peak VALUE
                # is an f32 FFT-map quantity fused nonlinearly across two
                # maps ((p1^2+p2^2)/(p1+p2), compute_funcs.cu:1597-1680)
                # vs the binary's direct sums — at the small windows these
                # configs produce, values spread up to ~1.4e-2 (measured)
                # while the reliability it feeds moves by at most the same
                # amount, far below the 0.6-ish thresholds
                assert mine.displ[i] == int(a.get("displ")), (r, c, side, ax)
                assert abs(mine.ncc_peak[i]
                           - float(a.get("nccPeak"))) < 2e-2, (r, c, side, ax)
                n_checked += 1
    links = rows * (cols - 1) + (rows - 1) * cols
    assert n_checked == links * 3
