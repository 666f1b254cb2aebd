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
    n = downsample_series(d, tmp_path / "small", factor=2, method="mean")
    assert n == 5  # every plane, names preserved (reference tool is 2D)
    img = tio.imread(tmp_path / "small" / "img_000000.tif")
    assert img.shape == (16, 16)
    n = downsample_series(d, tmp_path / "small2", factor=2, z_factor=2)
    assert n == 3  # z decimation is the opt-in extension
    assert renumber_series(tmp_path / "small") == 5


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


def test_scanner_recovers_injected_drift(tmp_path, rng):
    """VERDICT round-1 item 5: synthetic piezo grid with an injected
    stage-axis drift (every +x stack step also creeps +2 px in y) is
    recovered to +-1 px by drift-recentered rounds + the weighted LS
    solve (reference AverageDrift + flat_adjust_stacks roles)."""
    from ipp_tpu.stitch.scan import Scanner, ScanStack

    vol = make_phantom(rng, (12, 140, 260), smooth=6.0)
    # 3 stacks along x, nominal x0 = 0/80/160 with width 100 (20 px overlap)
    # true y creep: +2 px per x step (not told to the scanner)
    truth = []
    stacks = {}
    for xi in range(3):
        x0 = 80 * xi
        y0 = 2 * xi
        sub = vol[:, y0:y0 + 100, x0:x0 + 100]
        paths = _write_stack(tmp_path / f"s{xi}", sub)
        stacks[(xi, 0, 0)] = ScanStack(paths, x0=x0, y0=0, z0=0)
        truth.append((x0, y0, 0))
    sc = Scanner(stacks, slop=(5, 5, 2), dark=0.0)
    sc.align_all_stacks(rounds=2)
    assert sc.drift.yoffx != 0  # the creep was detected
    sc.apply_alignments()
    base = stacks[(0, 0, 0)]
    for xi in range(3):
        s = stacks[(xi, 0, 0)]
        tx, ty, tz = truth[xi]
        assert abs((s.x0 - base.x0) - tx) <= 1, (xi, s.x0, tx)
        assert abs((s.y0 - base.y0) - ty) <= 1, (xi, s.y0, ty)
        assert abs((s.z0 - base.z0) - tz) <= 1, (xi, s.z0, tz)


def test_scanstack_estimates_linear_creep(tmp_path, rng):
    """Per-stack linear x/y drift (reference x_off_per_z) estimated from
    first-vs-last-plane NCC and undone by read_plane."""
    from ipp_tpu.stitch.scan import ScanStack

    base = make_phantom(rng, (1, 96, 96), smooth=4.0)[0]
    nz = 9
    planes = []
    for z in range(nz):  # creep: +0.5 px/z in x
        dx = int(round(0.5 * z))
        planes.append(np.roll(base, dx, axis=1))
    paths = _write_stack(tmp_path / "drift", np.stack(planes))
    s = ScanStack(paths, x0=0, y0=0, z0=0)
    s.estimate_drift()
    assert abs(s.drift_x - 0.5) <= 0.15, s.drift_x
    assert abs(s.drift_y) <= 0.1, s.drift_y
    # reading with drift undone re-aligns the last plane to the first
    p_last = s.read_plane(nz - 1)
    inner = (slice(8, -8), slice(8, -8))
    corr = np.corrcoef(p_last[inner].ravel(), base[inner].ravel())[0, 1]
    assert corr > 0.98, corr


def test_scanner_dark_support_skips_empty_overlap(tmp_path, rng):
    """Pairs whose overlap is below the dark level are skipped
    (reference dark-frame masking, align_plane_x)."""
    from ipp_tpu.stitch.scan import Scanner, ScanStack

    a = np.zeros((6, 64, 64), np.uint16)  # all dark
    b = np.zeros((6, 64, 64), np.uint16)
    sa = ScanStack(_write_stack(tmp_path / "a", a), x0=0, y0=0, z0=0)
    sb = ScanStack(_write_stack(tmp_path / "b", b), x0=48, y0=0, z0=0)
    sc = Scanner({(0, 0, 0): sa, (1, 0, 0): sb}, dark=100.0, slop=(4, 4, 2))
    sc.align_all_stacks(rounds=1)
    assert ((0, 0, 0), (1, 0, 0)) not in sc.alignments


def test_scanner_linkless_stack_keeps_nominal_position(tmp_path, rng):
    """A stack whose every link was skipped (dark overlap) must keep its
    nominal stage position, not collapse to the solver's zero."""
    from ipp_tpu.stitch.scan import ScanStack, Scanner
    from ipp_tpu.io import tiff as tio

    stacks = {}
    for xi, x0 in ((0, 0), (1, 90)):
        d = tmp_path / f"s{xi}"
        d.mkdir()
        paths = []
        for z in range(3):
            p = d / f"{z:03d}.tif"
            tio.imwrite(p, (rng.random((40, 100)) * 1000 + 200)
                        .astype(np.uint16))
            paths.append(p)
        stacks[(xi, 0, 0)] = ScanStack(paths=paths, x0=x0, y0=0, z0=0)
    sc = Scanner(stacks)
    # inject one alignment involving only stack 0 ... none exist between
    # the pair: simulate the dark-skip by leaving alignments empty except
    # a self-consistent one for stack (0,0,0) is impossible, so directly
    # test the solver path with a single edge missing the second stack
    sc.alignments = {}
    sc.apply_alignments()  # no alignments: early return, positions kept
    assert sc.stacks[(1, 0, 0)].x0 == 90
    # now with one unrelated alignment so the solver actually runs
    d3 = tmp_path / "s2"
    d3.mkdir()
    paths = []
    for z in range(3):
        p = d3 / f"{z:03d}.tif"
        tio.imwrite(p, (rng.random((40, 100)) * 1000).astype(np.uint16))
        paths.append(p)
    sc.stacks[(2, 0, 0)] = ScanStack(paths=paths, x0=180, y0=0, z0=0)
    sc.alignments = {((0, 0, 0), (2, 0, 0)): (0, 182, 0)}
    sc.scores = {((0, 0, 0), (2, 0, 0)): 0.9}
    sc.apply_alignments()
    # stack 1 had no links: stays at its nominal 90 (after global rebase)
    assert abs(sc.stacks[(1, 0, 0)].x0 - 90) <= 1
    assert abs(sc.stacks[(2, 0, 0)].x0 - 182) <= 1


def test_scan_stitch_cli_dragonfly_tree(tmp_path, rng):
    """scan_stitch CLI end-to-end on a synthetic dragonfly hierarchy
    (reference tsv/stitch.py:16-193): discovery, alignment, placements
    JSON, offsets JSON reuse, blended plane series."""
    import json

    from ipp_tpu.pipeline import scan_stitch
    from tests.synth import write_dragonfly_tree

    root = tmp_path / "tree"
    truth, vol = write_dragonfly_tree(root, rng)
    out = tmp_path / "out"
    offs_json = tmp_path / "offsets.json"
    stacks_json = tmp_path / "stacks.json"
    base_args = [
        "--input", str(root),
        "--voxel-size", "1,1,1", "--z-step", "12", "--piezo-distance", "16",
        "--x-slop", "5", "--y-slop", "5", "--z-slop", "4",
        "--dark", "100", "--threshold", "0.5", "--rounds", "1",
        "--n-io-cores", "2", "--compression", "0"]
    rc = scan_stitch.main(base_args + [
        "--output-pattern", str(out / "img_%04d.tif"),
        "--stack-offset-output", str(offs_json),
        "--stacks", str(stacks_json)])
    assert rc == 0

    placed = {tuple(d["key"]): np.array([d["x0"], d["y0"], d["z0"]])
              for d in json.load(open(stacks_json))}
    assert set(placed) == set(truth)
    t0 = np.array(truth[(0, 0, 0)])
    p0 = placed[(0, 0, 0)]
    for k, t in truth.items():
        rel_err = np.abs((placed[k] - p0) - (np.array(t) - t0))
        assert np.all(rel_err <= 1), (k, placed[k] - p0, np.array(t) - t0)

    planes = sorted(out.glob("img_*.tif"))
    depth = max(int(p[2]) + 16 for p in placed.values())
    assert len(planes) == depth
    mid = tio.imread(planes[depth // 2])
    assert mid.shape == (max(int(p[1]) for p in placed.values()) + 80,
                         max(int(p[0]) for p in placed.values()) + 128)
    assert np.count_nonzero(mid) > 0.9 * mid.size

    # offsets JSON reuse skips alignment and reproduces the placements
    out2 = tmp_path / "out2"
    stacks_json2 = tmp_path / "stacks2.json"
    rc = scan_stitch.main(base_args + [
        "--output-pattern", str(out2 / "img_%04d.tif"),
        "--stack-offset-input", str(offs_json),
        "--stacks", str(stacks_json2)])
    assert rc == 0
    placed2 = {tuple(d["key"]): np.array([d["x0"], d["y0"], d["z0"]])
               for d in json.load(open(stacks_json2))}
    assert all(np.array_equal(placed[k], placed2[k]) for k in placed)


def test_tsv_tools_convert_cli(tmp_path, rng):
    """The tsv/convert.py role: XML -> 2D series with reference-style
    output pattern (absolute-z names), --volume sub-extent, and
    --mipmap-level decimation (every 2^L-th plane at 1/2^L resolution,
    reference tsv/convert.py:81-97,116-135)."""
    from ipp_tpu.pipeline import tsv_tools
    from tests.synth import cut_tiles, make_phantom, write_tile_grid

    vol = make_phantom(rng, (8, 128, 128))
    tiles, _ = cut_tiles(vol, 2, 2, (80, 80), 32, 0, rng)
    grid = write_tile_grid(tmp_path / "tiles", tiles, overlap_nominal_px=32)
    xml = tmp_path / "step5.xml"
    grid.to_xml(xml)

    out = tmp_path / "out"
    rc = tsv_tools.main([
        "convert", "--xml-path", str(xml),
        "--output-pattern", str(out / "img_{z:04d}.tif"),
        "--compression", "3", "--cpus", "4"])
    assert rc == 0
    planes = sorted(out.glob("img_*.tif"))
    assert [p.name for p in planes] == [f"img_{z:04d}.tif" for z in range(8)]
    full_shape = tio.imread(planes[0]).shape

    # mipmap level 1: every 2nd plane at half resolution
    out2 = tmp_path / "mip"
    rc = tsv_tools.main([
        "convert", "--xml-path", str(xml),
        "--output-pattern", str(out2 / "img_{z:04d}.tif"),
        "--mipmap-level", "1"])
    assert rc == 0
    mips = sorted(out2.glob("img_*.tif"))
    assert [p.name for p in mips] == [f"img_{z:04d}.tif"
                                      for z in range(0, 8, 2)]
    m = tio.imread(mips[0])
    assert m.shape == ((full_shape[0] + 1) // 2, (full_shape[1] + 1) // 2)
    np.testing.assert_array_equal(m, tio.imread(planes[0])[::2, ::2])

    # --volume sub-extent: absolute-z plane names, cropped canvas
    out3 = tmp_path / "sub"
    rc = tsv_tools.main([
        "convert", "--xml-path", str(xml),
        "--output-pattern", str(out3 / "img_{z:04d}.tif"),
        "--volume", "8,72,4,68,2,6"])
    assert rc == 0
    subs = sorted(out3.glob("img_*.tif"))
    assert [p.name for p in subs] == [f"img_{z:04d}.tif"
                                      for z in range(2, 6)]
    s = tio.imread(subs[0])
    assert s.shape == (64, 64)
    np.testing.assert_array_equal(s, tio.imread(planes[2])[4:68, 8:72])


def test_scanner_composite_fillin_min_support(tmp_path, rng):
    """Adjacent pairs with NO surviving link get their peers' median
    offset when at least min_support same-direction links exist, and
    keep leaning on the nominal chain otherwise (reference
    flat_adjust_stacks median fill-in, tsv/scan.py:748,760)."""
    from ipp_tpu.stitch.scan import Scanner, ScanStack

    n = 6
    vols = make_phantom(rng, (2, 16, 16), smooth=2.0)
    base_paths = {xi: _write_stack(tmp_path / f"s{xi}", vols)
                  for xi in range(n)}

    def run(min_support):
        stacks = {(xi, 0, 0): ScanStack(base_paths[xi],
                                        x0=100 * xi, y0=0, z0=0)
                  for xi in range(n)}
        sc = Scanner(stacks, min_support=min_support)
        for xi in range(n - 1):
            if xi == 2:
                continue  # the unlinked pair (2,0,0)->(3,0,0)
            # +2 px/step y creep relative to the nominal grid
            sc.alignments[((xi, 0, 0), (xi + 1, 0, 0))] = (2, 100, 0)
            sc.scores[((xi, 0, 0), (xi + 1, 0, 0))] = 0.9
        sc.apply_alignments()
        return {k: s.y0 for k, s in sc.stacks.items()}

    y = run(min_support=4)  # 4 surviving 'we' links >= 4 -> fill-in
    assert abs((y[(3, 0, 0)] - y[(2, 0, 0)]) - 2) <= 1, y
    assert abs((y[(5, 0, 0)] - y[(0, 0, 0)]) - 10) <= 1, y
    y = run(min_support=99)  # gated: the gap is NOT bridged with +2
    assert y[(3, 0, 0)] - y[(2, 0, 0)] < 2, y


def test_scanner_no_links_still_rebases(tmp_path, rng):
    """Absolute dragonfly stage coordinates must be rebased to origin 0
    even when no alignment links survive, or downstream canvases would
    allocate the whole stage extent."""
    from ipp_tpu.stitch.scan import Scanner, ScanStack

    vols = make_phantom(rng, (2, 16, 16), smooth=2.0)
    s = ScanStack(_write_stack(tmp_path / "solo", vols),
                  x0=85000, y0=42000, z0=9000)
    sc = Scanner({(0, 0, 0): s})
    sc.apply_alignments()
    assert (s.x0, s.y0, s.z0) == (0, 0, 0)
    assert sc.volume.x1 == 16 and sc.volume.y1 == 16 and sc.volume.z1 == 2


def test_scan_stitch_cli_compat_and_edge_cases(tmp_path, rng):
    """Reference-surface compat flags parse (--n-cores/--loose-x/--z-skip),
    a stray non-numeric plane file is skipped without discarding its
    substack, z-indexed output DIRECTORIES are created per plane
    (reference tsv/stitch.py:184), and --compression passes the zlib
    level through to the TIFF writer."""
    from ipp_tpu.pipeline import scan_stitch
    from tests.synth import write_dragonfly_tree

    root = tmp_path / "tree"
    truth, vol = write_dragonfly_tree(root, rng)
    sub = next(d for d in sorted(root.iterdir()) if d.is_dir())
    subsub = next(d for d in sorted(sub.iterdir()) if d.is_dir())
    (subsub / "preview.tif").write_bytes(b"not a plane")
    out = tmp_path / "out"
    rc = scan_stitch.main([
        "--input", str(root), "--voxel-size", "1,1,1",
        "--z-step", "12", "--piezo-distance", "16",
        "--x-slop", "5", "--y-slop", "5", "--z-slop", "4",
        "--dark", "100", "--threshold", "0.5", "--rounds", "1",
        "--n-io-cores", "2",
        "--n-cores", "24", "--loose-x", "--z-skip", "middle",
        "--compression", "9",
        "--output-pattern", str(out / "%04d" / "plane.tif")])
    assert rc == 0
    planes = sorted(out.glob("*/plane.tif"))
    assert len(planes) >= 16  # all substacks survived the stray file
    img = tio.imread(planes[len(planes) // 2])
    assert img.dtype == np.uint16
    assert np.count_nonzero(img) > 0.5 * img.size
