"""Scanner (piezo) alignment, tsv mini tools, LQP placement."""

import numpy as np
import pytest

from ipp_tpu.geometry.extent import VExtent
from ipp_tpu.io import tiff as tio
from tests.synth import make_phantom


def _write_stack(d, vol):
    d.mkdir(parents=True, exist_ok=True)
    paths = []
    for z in range(vol.shape[0]):
        p = d / f"{z:06d}.tif"
        tio.imwrite(p, vol[z])
        paths.append(p)
    return paths


def test_scanner_aligns_3d_grid(tmp_path, rng):
    from ipp_tpu.stitch.scan import Scanner, ScanStack

    vol = make_phantom(rng, (40, 96, 176), smooth=6.0)
    # two stacks overlapping in x with jitter (+2, -1, +1)
    a = vol[2:34, 10:90, 0:96]
    b = vol[3:35, 9:89, 70:166]  # nominal x0=72 -> true 70, dy=-1, dz=+1
    sa = ScanStack(_write_stack(tmp_path / "a", a), x0=0, y0=10, z0=0)
    sb = ScanStack(_write_stack(tmp_path / "b", b), x0=72, y0=10, z0=0)
    sc = Scanner({(0, 0, 0): sa, (1, 0, 0): sb}, slop=(6, 6, 3))
    sc.align_all_stacks()
    coord = sc.alignments[((0, 0, 0), (1, 0, 0))]
    # coord = (V, H, D) position of b relative to a
    assert coord[1] == 70, coord
    assert coord[0] == -1, coord
    assert coord[2] == 1, coord
    sc.apply_alignments()
    assert sb.x0 - sa.x0 == 70
    assert sb.y0 - sa.y0 == -1
    assert sb.z0 - sa.z0 == 1


def test_scanner_blend_reads(tmp_path, rng):
    from ipp_tpu.stitch.scan import Scanner, ScanStack

    vol = make_phantom(rng, (8, 64, 120), smooth=5.0)
    a = vol[:, :, :70]
    b = vol[:, :, 50:]
    sa = ScanStack(_write_stack(tmp_path / "a", a), x0=0, y0=0, z0=0)
    sb = ScanStack(_write_stack(tmp_path / "b", b), x0=50, y0=0, z0=0)
    sc = Scanner({(0, 0, 0): sa, (1, 0, 0): sb})
    out = sc.imread(VExtent(0, 120, 0, 64, 2, 4))
    ref = vol[2:4]
    rel = np.abs(out.astype(np.float64) - ref) / np.maximum(ref, 1)
    assert rel.mean() < 0.01


def test_tsv_tools(tmp_path, rng):
    from ipp_tpu.pipeline.tsv_tools import (downsample_series, fill_blanks,
                                            renumber_series)

    d = tmp_path / "series"
    d.mkdir()
    for z in [0, 1, 3, 4]:  # plane 2 missing
        tio.imwrite(d / f"img_{z:06d}.tif",
                    (rng.random((32, 32)) * 100).astype(np.uint16))
    assert fill_blanks(d) == 1
    assert (d / "img_000002.tif").exists()
    n = downsample_series(d, tmp_path / "small", factor=2)
    assert n == 3  # 5 planes -> every 2nd
    img = tio.imread(tmp_path / "small" / "img_000000.tif")
    assert img.shape == (16, 16)
    assert renumber_series(tmp_path / "small") == 3


def test_justified_stitch(rng):
    from ipp_tpu.pipeline.tsv_tools import justified_stitch

    vol = make_phantom(rng, (1, 64, 100), smooth=5.0)[0]
    a = vol[:, :60]
    b = vol[:, 40:]
    out = justified_stitch(a, b, (0, 40))
    assert out.shape == (64, 100)
    rel = np.abs(out.astype(np.float64) - vol) / np.maximum(vol, 1)
    assert rel.mean() < 0.01


def test_lqp_placement_matches_truth(tmp_path, rng):
    from ipp_tpu.stitch.align import compute_displacements
    from ipp_tpu.stitch.place import (place_tiles_lqp, project_displacements,
                                      threshold_displacements)
    from tests.synth import cut_tiles, write_tile_grid

    vol = make_phantom(rng, (8, 300, 300), smooth=8.0)
    tiles, offsets = cut_tiles(vol, 2, 2, (128, 128), 48, jitter=4, rng=rng)
    grid = write_tile_grid(tmp_path, tiles, overlap_nominal_px=48)
    cands = compute_displacements(grid, 48, 48, displ_max_v=8, displ_max_h=8,
                                  displ_max_d=2, subvol_dim=8)
    project_displacements(grid, cands, 48, 48)
    threshold_displacements(grid, 0.6)
    place_tiles_lqp(grid)
    truth = np.array([[offsets[r][c] for c in range(2)] for r in range(2)])
    got = np.array([[(grid.stacks[r][c].abs_h, grid.stacks[r][c].abs_v,
                      grid.stacks[r][c].abs_d) for c in range(2)]
                    for r in range(2)])
    delta = got - truth
    assert (np.abs(delta - delta[0, 0]) <= 1).all(), delta - delta[0, 0]


def test_generate_downsampled_npz(tmp_path, rng):
    from ipp_tpu.pipeline.tsv_tools import generate_downsampled_npz

    d = tmp_path / "s"
    d.mkdir()
    for z in range(8):
        tio.imwrite(d / f"img_{z:06d}.tif",
                    (rng.random((40, 60)) * 100).astype(np.uint16))
    npz = generate_downsampled_npz(d, tmp_path / "v.npz", (2.0, 1.0, 1.0),
                                   4.0)
    data = np.load(npz, allow_pickle=True)
    assert data["I"].shape == (4, 10, 15)
    assert len(data["xI"]) == 3
