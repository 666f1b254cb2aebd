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


def write_dragonfly_tree(root: Path, rng, *, tile_hw=(80, 128),
                         n_x=2, n_y=1, overlap_x=32, overlap_y=24,
                         sub_planes=16, n_sub=2,
                         z_step_px=12, jitter=2, margin=4, smooth=4.0):
    """Write a dragonfly X/X_Y/Z hierarchy (tsv/scan.py:221-268 naming:
    coordinates in 10ths of microns, voxel size 1 um) cut from one smooth
    phantom with known per-substack jitter.

    Substack plane files are named so the reference's piezo split (gap of
    ``sub_planes`` um, stepper advance ``z_step_px`` um) reproduces the
    grid.  Returns (truth, phantom) where truth[(xi, 0, zi)] = the true
    (x, y, z) phantom position of that substack's first voxel.
    """
    th, tw = tile_hw
    step_x = tw - overlap_x
    step_y = th - overlap_y
    depth_needed = z_step_px * (n_sub - 1) + sub_planes
    vol = make_phantom(
        rng, (depth_needed + 2 * margin,
              step_y * (n_y - 1) + th + 2 * margin,
              step_x * (n_x - 1) + tw + 2 * margin), smooth=smooth)
    truth = {}
    for xi in range(n_x):
        x_tenths = xi * step_x * 10
        for yi in range(n_y):
            y_tenths = yi * step_y * 10
            for zi in range(n_sub):
                jx = jy = jz = 0
                if xi or yi or zi:
                    jx, jy, jz = (int(rng.integers(-jitter, jitter + 1))
                                  for _ in range(3))
                x0 = margin + xi * step_x + jx
                y0 = margin + yi * step_y + jy
                z0 = margin + zi * z_step_px + jz
                truth[(xi, yi, zi)] = (x0 - margin, y0 - margin, z0 - margin)
                d = root / f"{x_tenths}" / f"{x_tenths}_{y_tenths}"
                d.mkdir(parents=True, exist_ok=True)
                for p in range(sub_planes):
                    # file z-coordinate runs continuously across substacks
                    # so the reference's >=piezo_distance gap rule splits
                    # them
                    z_tenths = (zi * sub_planes + p) * 10
                    tio.imwrite(d / f"{z_tenths:06d}.tif",
                                vol[z0 + p, y0:y0 + th, x0:x0 + tw])
    return truth, vol


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
