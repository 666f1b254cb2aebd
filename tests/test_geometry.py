import numpy as np
import pytest

from ipp_tpu.geometry.extent import VExtent
from ipp_tpu.geometry.stacks import Displacement, TileGrid, TileStack
from tests.synth import cut_tiles, make_phantom, write_tile_grid


def test_vextent_basics():
    a = VExtent(0, 10, 0, 20, 0, 5)
    b = VExtent(5, 15, 10, 30, 0, 5)
    assert a.shape == (5, 20, 10)
    assert a.intersects(b)
    i = a.intersection(b)
    assert i == VExtent(5, 10, 10, 20, 0, 5)
    assert a.contains(i) and b.contains(i)
    assert not a.contains(b)
    c = VExtent(100, 110, 0, 20, 0, 5)
    assert not a.intersects(c)


def test_vextent_local_slices():
    a = VExtent(10, 30, 5, 25, 0, 4)
    sub = VExtent(12, 20, 10, 15, 1, 3)
    sz, sy, sx = a.local_slices(sub)
    assert (sz, sy, sx) == (slice(1, 3), slice(5, 10), slice(2, 10))


def test_tile_grid_roundtrip_xml(tmp_path, rng):
    vol = make_phantom(rng, (4, 128, 128))
    tiles, _ = cut_tiles(vol, 2, 2, (80, 80), 32, 0, rng)
    grid = write_tile_grid(tmp_path, tiles, overlap_nominal_px=32)
    grid.stacks[1][0].north = Displacement(
        displ=(3, -2, 1), reliability=(0.9, 0.8, 0.7), ncc_peak=(0.95, 0.9, 0.85))
    xml_path = tmp_path / "step.xml"
    grid.to_xml(xml_path)

    grid2 = TileGrid.from_xml(xml_path)
    assert grid2.n_rows == 2 and grid2.n_cols == 2
    s = grid2.stacks[1][0]
    assert s.north is not None
    assert s.north.displ == (3, -2, 1)
    np.testing.assert_allclose(s.north.reliability, (0.9, 0.8, 0.7))
    assert grid2.stacks[0][1].abs_h == grid.stacks[0][1].abs_h


def test_tile_stack_reads_planes(tmp_path, rng):
    vol = make_phantom(rng, (4, 128, 128))
    tiles, _ = cut_tiles(vol, 2, 2, (80, 80), 32, 0, rng)
    grid = write_tile_grid(tmp_path, tiles, overlap_nominal_px=32)
    s = grid.stacks[0][0]
    assert s.depth == 4
    np.testing.assert_array_equal(s.read_plane(2), tiles[0][0][2])
    ext = VExtent(s.abs_h + 5, s.abs_h + 25, s.abs_v + 10, s.abs_v + 40, 1, 3)
    block = s.imread(ext)
    np.testing.assert_array_equal(block, tiles[0][0][1:3, 10:40, 5:25])


def test_neighbor_chain_placement(tmp_path, rng):
    """place_from_neighbor_chain must replicate the TSV offset propagation
    (reference: tsv/volume.py:755-797)."""
    vol = make_phantom(rng, (4, 128, 128))
    tiles, _ = cut_tiles(vol, 2, 2, (80, 80), 32, 0, rng)
    grid = write_tile_grid(tmp_path, tiles, overlap_nominal_px=32)
    # nominal grid step is 48; claim NCC found displ (V=2, H=-46, D=0) for
    # the WEST link: west neighbor displacement means offset -= displ
    grid.stacks[0][1].west = Displacement(displ=(2, -46, 0))
    grid.stacks[1][0].north = Displacement(displ=(-44, 3, 0))
    grid.stacks[1][1].west = Displacement(displ=(2, -46, 0))
    grid.place_from_neighbor_chain()
    s00, s01 = grid.stacks[0][0], grid.stacks[0][1]
    s10, s11 = grid.stacks[1][0], grid.stacks[1][1]
    # rebased: relative placement preserved
    assert s01.abs_h - s00.abs_h == 46
    assert s01.abs_v - s00.abs_v == -2
    assert s10.abs_v - s00.abs_v == 44
    assert s10.abs_h - s00.abs_h == -3
    assert min(s.abs_h for s in grid.flattened()) == 0
    assert min(s.abs_v for s in grid.flattened()) == 0


def test_from_directory_discovery(tmp_path, rng):
    vol = make_phantom(rng, (3, 100, 100))
    tiles, _ = cut_tiles(vol, 2, 2, (60, 60), 20, 0, rng)
    write_tile_grid(tmp_path, tiles, overlap_nominal_px=20)
    grid = TileGrid.from_directory(tmp_path)
    assert grid.n_rows == 2 and grid.n_cols == 2
    assert grid.stacks[0][1].abs_h == 40
    assert grid.stacks[1][0].abs_v == 40
    assert grid.stacks[0][0].depth == 3
    assert grid.volume.shape == (3, 100, 100)
