"""End-to-end stitching: steps 2-6 on a synthetic 3x3 grid with known jitter
(BASELINE config 2)."""

import numpy as np
import pytest

from ipp_tpu.geometry.extent import VExtent
from ipp_tpu.stitch.align import compute_displacements
from ipp_tpu.stitch.blend import PlaneBlender, cosine_blend_weight, distance_from_edge
from ipp_tpu.stitch.place import (place_tiles_mst, project_displacements,
                                  threshold_displacements)
from tests.synth import cut_tiles, make_phantom, write_tile_grid


@pytest.fixture(scope="module")
def stitched_setup(tmp_path_factory):
    rng = np.random.default_rng(7)
    tmp_path = tmp_path_factory.mktemp("grid3")
    vol = make_phantom(rng, (12, 420, 420), smooth=8.0)
    tiles, offsets = cut_tiles(vol, 3, 3, (160, 160), 48, jitter=5, rng=rng)
    grid = write_tile_grid(tmp_path, tiles, overlap_nominal_px=48)
    return vol, tiles, offsets, grid


def test_full_alignment_recovers_truth(stitched_setup):
    vol, tiles, offsets, grid = stitched_setup
    overlap = 48
    cands = compute_displacements(grid, overlap_v=overlap, overlap_h=overlap,
                                  displ_max_v=12, displ_max_h=12,
                                  displ_max_d=3, subvol_dim=12)
    project_displacements(grid, cands, overlap, overlap)
    threshold_displacements(grid, reliability_threshold=0.6)
    assert all(s.stitchable for s in grid.flattened())
    place_tiles_mst(grid)

    # recovered relative positions must equal ground truth (up to global shift)
    truth = np.array([[offsets[r][c] for c in range(3)] for r in range(3)])
    got = np.array([[(grid.stacks[r][c].abs_h, grid.stacks[r][c].abs_v,
                      grid.stacks[r][c].abs_d) for c in range(3)]
                    for r in range(3)])
    delta = got - truth
    # same global shift everywhere, exactly
    assert (delta == delta[0, 0]).all(), f"misplacement:\n{delta - delta[0, 0]}"


def test_blend_reconstructs_phantom(stitched_setup):
    vol, tiles, offsets, grid = stitched_setup
    overlap = 48
    cands = compute_displacements(grid, overlap_v=overlap, overlap_h=overlap,
                                  displ_max_v=12, displ_max_h=12,
                                  displ_max_d=3, subvol_dim=12)
    project_displacements(grid, cands, overlap, overlap)
    threshold_displacements(grid, reliability_threshold=0.6)
    place_tiles_mst(grid)

    blender = PlaneBlender([s.extent for s in grid.flattened()], cosine=True)
    stacks = grid.flattened()

    def reader(i, inter):
        return stacks[i].imread(inter)

    z = 5
    bbox = grid.volume
    plane_ext = VExtent(bbox.x0, bbox.x1, bbox.y0, bbox.y1, z, z + 1)
    merged = blender.blend_plane(plane_ext, reader, dtype=np.uint16)

    # compare against the phantom over the region the tiles actually cover;
    # alignment shift: tile (0,0) truth is offsets[0][0]=(0,0,0) and its
    # placed position is stacks[0].abs_*, so phantom coords = merged coords
    # + (truth - placed)
    s00 = grid.stacks[0][0]
    dx = 0 - s00.abs_h
    dy = 0 - s00.abs_v
    h, w = merged.shape
    ph = vol[z, max(0, dy):max(0, dy) + h, max(0, dx):max(0, dx) + w]
    hh = min(ph.shape[0], h)
    ww = min(ph.shape[1], w)
    m = merged[:hh, :ww].astype(np.float64)
    p = ph[:hh, :ww].astype(np.float64)
    # ignore uncovered (zero) area
    mask = m > 0
    corr = np.corrcoef(m[mask], p[mask])[0, 1]
    assert corr > 0.995, corr
    rel_err = np.abs(m[mask] - p[mask]).mean() / p[mask].mean()
    assert rel_err < 0.02, rel_err


def test_distance_from_edge_matches_reference_shape():
    stack = VExtent(0, 100, 0, 100, 0, 10)
    ostack = VExtent(80, 180, 0, 100, 0, 10)
    iv = stack.intersection(ostack)
    d = distance_from_edge(iv, stack, ostack)
    od = distance_from_edge(iv, ostack, stack)
    assert d.shape == iv.shape
    # stack's weight should fall toward its right (x1) edge
    assert d[0, 0, -1] <= d[0, 0, 0]
    # and ostack's weight rises with x
    assert od[0, 0, 0] <= od[0, 0, -1]
    # blend weights of the two sides sum to ~1 (sin^2 + cos^2)
    w1 = np.sin(np.arctan2(d, od)) ** 2
    w2 = np.sin(np.arctan2(od, d)) ** 2
    np.testing.assert_allclose(w1 + w2, 1.0, atol=1e-6)


def test_max_blend_mode(stitched_setup):
    vol, tiles, offsets, grid = stitched_setup
    blender = PlaneBlender([s.extent for s in grid.flattened()], cosine=False)
    stacks = grid.flattened()
    bbox = grid.volume
    plane_ext = VExtent(bbox.x0, bbox.x1, bbox.y0, bbox.y1, 0, 1)
    merged = blender.blend_plane(plane_ext, lambda i, e: stacks[i].imread(e),
                                 dtype=np.uint16)
    assert merged.shape == plane_ext.shape[1:]
    assert merged.max() > 0


def test_merge_rotation_flip_and_diag_stack(stitched_setup, tmp_path):
    """Merge-time rotation/flip (reference tsv/convert.py:130-135) and the
    tile-channel diagnostics stack (tsv/convert.py:234-282)."""
    from ipp_tpu.io import tiff as tio
    from ipp_tpu.stitch.merge import make_diag_stack, merge_to_tif_series

    vol, tiles, offsets, grid = stitched_setup
    out0, _ = merge_to_tif_series(grid, tmp_path / "m0")
    out90, _ = merge_to_tif_series(grid, tmp_path / "m90", rotation=90)
    outfl, _ = merge_to_tif_series(grid, tmp_path / "mfl", flip_ud=True)
    a = tio.imread(out0 / "img_000003.tif")
    b = tio.imread(out90 / "img_000003.tif")
    c = tio.imread(outfl / "img_000003.tif")
    np.testing.assert_array_equal(b, np.rot90(a, 1))
    np.testing.assert_array_equal(c, a[::-1])

    d = make_diag_stack(grid, tmp_path / "diag", mipmap_level=1)
    planes = sorted(d.glob("diag_*.tif"))
    assert len(planes) == (grid.volume.z1 - grid.volume.z0 + 1) // 2
    img = tio.imread(planes[0])
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.max() > 0


def test_partitioned_displacements_merge_matches_whole(stitched_setup):
    """Step 2 partitioned by z-range across workers and reduced with
    merge_displacement_candidates equals the single-shot run — the
    mergedisplacements-binary role for the reference's MPI step-2
    partial XMLs (utils/mergedisplacements; Parastitcher.py:410-470)."""
    from ipp_tpu.stitch.align import merge_displacement_candidates

    vol, tiles, offsets, grid = stitched_setup
    overlap = 48
    kw = dict(overlap_v=overlap, overlap_h=overlap, displ_max_v=12,
              displ_max_h=12, displ_max_d=3, subvol_dim=6)
    whole = compute_displacements(grid, **kw)
    part_a = compute_displacements(grid, z_range=(0, 6), **kw)
    part_b = compute_displacements(grid, z_range=(6, 12), **kw)
    merged = merge_displacement_candidates([part_a, part_b])
    assert merged.keys() == whole.keys()
    for key in whole:
        assert len(merged[key]) == len(whole[key])
        for a, b in zip(whole[key], merged[key]):
            assert a.displ == b.displ, (key, a.displ, b.displ)
            np.testing.assert_allclose(a.ncc_peak, b.ncc_peak, atol=1e-5)


def test_compute_displacements_mesh_matches_single_device(stitched_setup):
    """Step 2 sharded over an 8-device mesh must give the same candidates
    as one device (the MPI master_step2 role, Parastitcher.py:410-470)."""
    from ipp_tpu.parallel.mesh import make_mesh

    vol, tiles, offsets, grid = stitched_setup
    overlap = 48
    kw = dict(overlap_v=overlap, overlap_h=overlap, displ_max_v=12,
              displ_max_h=12, displ_max_d=3, subvol_dim=12)
    c1 = compute_displacements(grid, mesh=make_mesh(1), **kw)
    c8 = compute_displacements(grid, mesh=make_mesh(8), **kw)
    assert c1.keys() == c8.keys()
    for key in c1:
        for a, b in zip(c1[key], c8[key]):
            assert a.displ == b.displ, (key, a.displ, b.displ)
            assert a.ncc_width == b.ncc_width
            np.testing.assert_allclose(a.ncc_peak, b.ncc_peak, atol=1e-5)


def test_merge_mesh_matches_single_device(stitched_setup, tmp_path):
    """Step 6 plane-batch sharding over an 8-device mesh must write
    identical planes to the single-device path (the MPI master_step6 role,
    Parastitcher.py:519-620), including the isotropic downsample."""
    from ipp_tpu.io import tiff as tio
    from ipp_tpu.parallel.mesh import make_mesh
    from ipp_tpu.stitch.merge import merge_to_tif_series

    vol, tiles, offsets, grid = stitched_setup
    out1, ds1 = merge_to_tif_series(grid, tmp_path / "m1", mesh=None,
                                    target_voxel_um=4.0)
    out8, ds8 = merge_to_tif_series(grid, tmp_path / "m8", mesh=make_mesh(8),
                                    target_voxel_um=4.0)
    p1 = sorted(out1.glob("img_*.tif"))
    p8 = sorted(out8.glob("img_*.tif"))
    assert [p.name for p in p1] == [p.name for p in p8] and p1
    for a, b in zip(p1, p8):
        np.testing.assert_array_equal(tio.imread(a), tio.imread(b))
    np.testing.assert_allclose(ds1, ds8, atol=1e-3)


def test_merge_integer_fetch_matches_float_path(stitched_setup, tmp_path):
    """The device-side u16 fetch (taken when no post-processing needs the
    float canvas) writes the same planes as the float-fetch path (forced
    here via an identity post_fn)."""
    from ipp_tpu.io import tiff as tio
    from ipp_tpu.stitch.merge import merge_to_tif_series

    vol, tiles, offsets, grid = stitched_setup
    out_u16, _ = merge_to_tif_series(grid, tmp_path / "u16")
    out_f32, _ = merge_to_tif_series(grid, tmp_path / "f32",
                                     post_fn=lambda p: p)
    p1 = sorted(out_u16.glob("img_*.tif"))
    p2 = sorted(out_f32.glob("img_*.tif"))
    assert p1 and len(p1) == len(p2)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(tio.imread(a), tio.imread(b))


def test_merge_float_dtype_with_downsample_still_emits_npz(stitched_setup,
                                                           tmp_path):
    """A float output dtype must not take the integer fast path and skip
    the isotropic-downsample accumulation."""
    from ipp_tpu.stitch.merge import merge_to_tif_series

    vol, tiles, offsets, grid = stitched_setup
    out, ds = merge_to_tif_series(grid, tmp_path / "f32ds",
                                  dtype=np.float32, target_voxel_um=4.0)
    assert ds is not None and ds.ndim == 3 and ds.size > 0


def test_merge_device_post_matches_host_post(stitched_setup, tmp_path):
    """post_fn_device (batched, sharded, applied on the canvas before the
    fetch) must write the same planes and npz as the per-plane host
    post_fn — single device and 8-device mesh."""
    import jax
    import jax.numpy as jnp

    from ipp_tpu.io import tiff as tio
    from ipp_tpu.ops.intensity import convert_to_8bit as to8
    from ipp_tpu.ops.intensity import subtract_dark
    from ipp_tpu.parallel.mesh import make_mesh
    from ipp_tpu.stitch.merge import merge_to_tif_series

    vol, tiles, offsets, grid = stitched_setup

    def _post(x):
        return to8(subtract_dark(x, 50.0), 8)

    def host_post(plane):
        return np.asarray(_post(
            jnp.asarray(np.clip(plane, 0, 65535).astype(np.uint16))))

    dev_post = jax.jit(
        lambda x: _post(jnp.clip(x, 0, 65535).astype(jnp.uint16)))

    out_h, ds_h = merge_to_tif_series(
        grid, tmp_path / "hostp", post_fn=host_post, dtype=np.uint8,
        target_voxel_um=4.0)
    out_d, ds_d = merge_to_tif_series(
        grid, tmp_path / "devp", post_fn=host_post, post_fn_device=dev_post,
        dtype=np.uint8, target_voxel_um=4.0, mesh=make_mesh(8))
    ph = sorted(out_h.glob("img_*.tif"))
    pd = sorted(out_d.glob("img_*.tif"))
    assert ph and [p.name for p in ph] == [p.name for p in pd]
    for a, b in zip(ph, pd):
        ia = tio.imread(a)
        assert ia.dtype == np.uint8
        np.testing.assert_array_equal(ia, tio.imread(b))
    np.testing.assert_allclose(ds_h, ds_d, atol=1e-3)


def test_merge_downsample_follows_written_plane(stitched_setup, tmp_path):
    """The isotropic-downsample accumulation reads the WRITTEN plane
    (post-processed, converted, rotated) — the reference's ordering
    (parallel_image_processor.py:341-384: rot90 then save then
    block_reduce of the saved image).  At target == source voxel the
    npz volume IS the written (rotated) series."""
    from ipp_tpu.io import tiff as tio
    from ipp_tpu.stitch.merge import merge_to_tif_series

    vol, tiles, offsets, grid = stitched_setup
    out0, _ = merge_to_tif_series(grid, tmp_path / "rot0")
    outr, ds = merge_to_tif_series(grid, tmp_path / "rot90", rotation=90,
                                   target_voxel_um=1.0)
    planes0 = sorted(out0.glob("img_*.tif"))
    planesr = sorted(outr.glob("img_*.tif"))
    assert planes0 and len(planes0) == len(planesr)
    assert ds is not None and ds.shape[0] == len(planesr)
    for k, (p0, pr) in enumerate(zip(planes0, planesr)):
        rotated = np.rot90(tio.imread(p0))
        written = tio.imread(pr)
        np.testing.assert_array_equal(rotated, written)
        np.testing.assert_allclose(ds[k], written.astype(np.float32),
                                   atol=1e-2)


def test_merge_plane_batch_matches_unbatched(stitched_setup, tmp_path):
    """Single-device plane batching (dispatch-latency amortization) writes
    identical planes to the per-plane path."""
    from ipp_tpu.io import tiff as tio
    from ipp_tpu.stitch.merge import merge_to_tif_series

    vol, tiles, offsets, grid = stitched_setup
    out1, _ = merge_to_tif_series(grid, tmp_path / "b1")
    out4, _ = merge_to_tif_series(grid, tmp_path / "b4", plane_batch=4)
    p1 = sorted(out1.glob("img_*.tif"))
    p4 = sorted(out4.glob("img_*.tif"))
    assert [p.name for p in p1] == [p.name for p in p4] and p1
    for a, b in zip(p1, p4):
        np.testing.assert_array_equal(tio.imread(a), tio.imread(b))


def test_place_tiles_mst_single_tile_grid(tmp_path, rng):
    """A 1x1 grid has no links; placement must no-op, not crash."""
    from ipp_tpu.geometry.stacks import TileGrid
    from ipp_tpu.io import tiff as tio
    from ipp_tpu.stitch.place import place_tiles_mst

    d = tmp_path / "ch" / "000000" / "000000_000000"
    d.mkdir(parents=True)
    for z in range(3):
        tio.imwrite(d / f"{z:06d}.tif",
                    (rng.random((32, 32)) * 1000).astype(np.uint16))
    grid = TileGrid.from_directory(tmp_path / "ch")
    place_tiles_mst(grid)
    s = grid.stacks[0][0]
    assert (s.abs_v, s.abs_h, s.abs_d) == (0, 0, 0)
