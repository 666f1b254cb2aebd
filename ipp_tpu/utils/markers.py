"""Vaa3D marker / soma coordinate utilities.

Equivalents of the reference's marker shuttles
(supplements/merge_marker_files.py, supplements/convert_recut_terafly_imaris/
soma-coordinate converters, supplements/find_swc_location.py): read/write
Vaa3D .marker CSVs, merge with de-duplication, and convert coordinates
between pixel spaces (recut/terafly voxels <-> physical um <-> flipped axes).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence, Tuple

import numpy as np
import pandas as pd

__all__ = ["read_marker", "write_marker", "merge_marker_files",
           "convert_coordinates"]

MARKER_COLUMNS = ["x", "y", "z", "radius", "shape", "name", "comment",
                  "color_r", "color_g", "color_b"]


def read_marker(path) -> pd.DataFrame:
    """Read a Vaa3D .marker file (comma-separated, # comments)."""
    df = pd.read_csv(path, comment="#", header=None)
    df = df.iloc[:, : len(MARKER_COLUMNS)]
    df.columns = MARKER_COLUMNS[: df.shape[1]]
    for col in MARKER_COLUMNS:
        if col not in df.columns:
            df[col] = {"radius": 0, "shape": 1, "name": "", "comment": "",
                       "color_r": 255, "color_g": 0, "color_b": 0}.get(col, 0)
    return df[MARKER_COLUMNS]


def write_marker(df: pd.DataFrame, path) -> Path:
    path = Path(path)
    with open(path, "w") as f:
        f.write("#x, y, z, radius, shape, name, comment, color_r, color_g, "
                "color_b\n")
        df[MARKER_COLUMNS].to_csv(f, header=False, index=False)
    return path


def merge_marker_files(paths: Sequence, out_path,
                       dedup_radius: float = 0.0) -> Path:
    """Concatenate marker files; optionally drop points within dedup_radius
    of an earlier point (reference merge_marker_files.py)."""
    frames = [read_marker(p) for p in paths]
    merged = pd.concat(frames, ignore_index=True)
    if dedup_radius > 0 and len(merged) > 1:
        pts = merged[["x", "y", "z"]].to_numpy(float)
        keep = np.ones(len(pts), bool)
        for i in range(1, len(pts)):
            if not keep[: i].any():
                continue
            d = np.linalg.norm(pts[:i][keep[:i]] - pts[i], axis=1)
            if (d < dedup_radius).any():
                keep[i] = False
        merged = merged[keep]
    return write_marker(merged.reset_index(drop=True), out_path)


def convert_coordinates(
    df: pd.DataFrame,
    voxel_source: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    voxel_target: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    flip_lengths: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    offset: Tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> pd.DataFrame:
    """Coordinate shuttle between pixel spaces: scale by voxel ratio, flip
    axes of known length, add an offset (covers the recut/terafly/imaris
    soma conversions of supplements/convert_recut_terafly_imaris)."""
    out = df.copy()
    for ax, s, t, L, off in zip("xyz", voxel_source, voxel_target,
                                flip_lengths, offset):
        v = out[ax] * (s / t)
        if L and L > 0:
            v = L - v
        out[ax] = v + off
    return out
