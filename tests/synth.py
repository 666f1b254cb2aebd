"""Synthetic volume fixtures shared by geometry/stitch/merge tests.

The reference has no end-to-end fixtures (SURVEY §4 gap); these provide a
ground-truth phantom: a smooth random 3D texture, cut into an overlapping
tile grid with known sub-tile jitter, so alignment can be verified against
truth.
"""

from pathlib import Path
from typing import List, Tuple

import numpy as np
from scipy.ndimage import gaussian_filter

from ipp_tpu.geometry.stacks import TileGrid, TileStack
from ipp_tpu.io import tiff as tio


def make_phantom(rng, shape=(16, 256, 256), smooth=6.0, peak=40000.0):
    """Smooth positive 3D texture with structure at several scales."""
    vol = gaussian_filter(rng.standard_normal(shape), smooth)
    vol += 0.5 * gaussian_filter(rng.standard_normal(shape), smooth / 3)
    vol -= vol.min()
    vol /= vol.max()
    return (vol * peak).astype(np.uint16)


def cut_tiles(vol: np.ndarray, n_rows: int, n_cols: int, tile: Tuple[int, int],
              overlap: int, jitter: int, rng):
    """Cut an overlapping tile grid with integer jitter.

    Returns (tiles, true_offsets) where tiles[r][c] is (depth, th, tw) and
    true_offsets[r][c] = (x, y, z) absolute position in the phantom.
    """
    th, tw = tile
    step_y = th - overlap
    step_x = tw - overlap
    tiles: List[List[np.ndarray]] = []
    offsets: List[List[Tuple[int, int, int]]] = []
    for r in range(n_rows):
        trow, orow = [], []
        for c in range(n_cols):
            jy = int(rng.integers(-jitter, jitter + 1)) if (r or c) else 0
            jx = int(rng.integers(-jitter, jitter + 1)) if (r or c) else 0
            y0 = min(max(r * step_y + jy, 0), vol.shape[1] - th)
            x0 = min(max(c * step_x + jx, 0), vol.shape[2] - tw)
            trow.append(vol[:, y0:y0 + th, x0:x0 + tw].copy())
            orow.append((x0, y0, 0))
        tiles.append(trow)
        offsets.append(orow)
    return tiles, offsets


def write_tile_grid(tmp_path: Path, tiles, voxel_um=(1.0, 1.0, 1.0),
                    overlap_nominal_px=None, tile_shape=None) -> TileGrid:
    """Write tiles as a SmartSPIM-style dir hierarchy and build a TileGrid
    with nominal (stage) offsets."""
    n_rows = len(tiles)
    n_cols = len(tiles[0])
    depth, th, tw = tiles[0][0].shape
    step_y = th - (overlap_nominal_px or 0)
    step_x = tw - (overlap_nominal_px or 0)
    stacks = []
    for r in range(n_rows):
        row_stacks = []
        for c in range(n_cols):
            x_tenths = int(c * step_x * 10 * voxel_um[1])
            y_tenths = int(r * step_y * 10 * voxel_um[0])
            d = tmp_path / f"{x_tenths:06d}" / f"{x_tenths:06d}_{y_tenths:06d}"
            d.mkdir(parents=True, exist_ok=True)
            for z in range(depth):
                tio.imwrite(d / f"{z:06d}.tif", tiles[r][c][z])
            row_stacks.append(TileStack(
                row=r, col=c,
                dir_name=f"{x_tenths:06d}/{x_tenths:06d}_{y_tenths:06d}",
                root_dir=str(tmp_path),
                abs_h=c * step_x, abs_v=r * step_y, abs_d=0))
        stacks.append(row_stacks)
    return TileGrid(stacks, voxel_um=voxel_um, stacks_dir=str(tmp_path))
