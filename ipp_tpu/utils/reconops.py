"""Neuron-reconstruction file operations: SWC / ESWC / APO conversions.

Re-design of the reference's supplements/reconops.py (431 LoC): pandas
dataframes in, with axis flips, voxel rescaling, topological sorting, and
format conversions.  The reference's Vaa3D plugin shell-outs (resample,
N3DFix, inter-node pruning) are external binaries and are represented by
`sort_swc` (implemented natively) plus documented extension points.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np
import pandas as pd

__all__ = ["SWC_COLUMNS", "ESWC_COLUMNS", "read_swc", "read_eswc",
           "read_apo", "write_swc", "write_eswc", "sort_swc",
           "flip_and_scale", "swc_to_seeds"]

SWC_COLUMNS = ["id", "type", "x", "y", "z", "radius", "parent_id"]
ESWC_COLUMNS = ["seg_id", "level", "mode", "timestamp", "TFresindex"]


def read_swc(path) -> pd.DataFrame:
    return pd.read_csv(path, sep=r"\s+", comment="#", names=SWC_COLUMNS,
                       index_col=False)


def read_eswc(path) -> pd.DataFrame:
    return pd.read_csv(path, sep=r"\s+", comment="#",
                       names=SWC_COLUMNS + ESWC_COLUMNS, index_col=False)


def read_apo(path, radius: float = 12.0) -> pd.DataFrame:
    """APO (cell annotation) -> SWC-like points (reference reconops
    main(): type=1, parent=-1, sequential ids)."""
    df = pd.read_csv(path).drop_duplicates().reset_index(drop=True)
    df.columns = [c.strip() for c in df.columns]
    out = pd.DataFrame({
        "id": np.arange(1, len(df) + 1),
        "type": 1,
        "x": df["x"], "y": df["y"], "z": df["z"],
        "radius": radius,
        "parent_id": -1,
    })
    return out


def write_swc(df: pd.DataFrame, path, comment: str = "") -> Path:
    path = Path(path)
    with open(path, "w") as f:
        f.write(f"#{comment}\n#" + " ".join(SWC_COLUMNS) + "\n")
        df[SWC_COLUMNS].to_csv(f, sep=" ", index=False, header=False)
    return path


def write_eswc(df: pd.DataFrame, path, comment: str = "") -> Path:
    path = Path(path)
    out = df.copy()
    for col in ESWC_COLUMNS:
        if col not in out.columns:
            out[col] = 0
    with open(path, "w") as f:
        f.write(f"#{comment}\n#" + " ".join(SWC_COLUMNS + ESWC_COLUMNS) + "\n")
        out[SWC_COLUMNS + ESWC_COLUMNS].to_csv(f, sep=" ", index=False,
                                               header=False)
    return path


def flip_and_scale(df: pd.DataFrame,
                   flip_lengths: Tuple[float, float, float] = (0, 0, 0),
                   voxel_source: Tuple[float, float, float] = (1, 1, 1),
                   voxel_target: Tuple[float, float, float] = (1, 1, 1),
                   ) -> pd.DataFrame:
    """Axis flips (x -> L - x when L > 0) and voxel-size rescale
    (reference reconops main(), x/y/z_axis_length + voxel args)."""
    out = df.copy()
    for ax, L in zip("xyz", flip_lengths):
        if L and L > 0:
            out[ax] = L - out[ax]
    for ax, s, t in zip("xyz", voxel_source, voxel_target):
        out[ax] = out[ax] * (s / t)
    return out


def sort_swc(df: pd.DataFrame) -> pd.DataFrame:
    """Topological re-id: BFS from roots so every parent precedes its
    children and ids are contiguous from 1 (reference sort_swc,
    supplements/reconops.py:59-102)."""
    df = df.reset_index(drop=True)
    children: dict = {}
    for _, row in df.iterrows():
        children.setdefault(int(row["parent_id"]), []).append(int(row["id"]))
    by_id = {int(r["id"]): r for _, r in df.iterrows()}
    order = []
    visited = set()
    roots = [int(r["id"]) for _, r in df.iterrows()
             if int(r["parent_id"]) not in by_id]
    queue = list(roots)
    while queue:
        nid = queue.pop(0)
        if nid in visited:
            continue
        visited.add(nid)
        order.append(nid)
        queue.extend(children.get(nid, []))
    # orphan cycles: append any unvisited
    order += [int(i) for i in by_id if int(i) not in visited]
    new_id = {old: i + 1 for i, old in enumerate(order)}
    rows = []
    for old in order:
        r = by_id[old].copy()
        pid = int(r["parent_id"])
        r["parent_id"] = new_id.get(pid, -1) if pid in by_id else -1
        r["id"] = new_id[old]
        rows.append(r)
    return pd.DataFrame(rows).reset_index(drop=True)


def swc_to_seeds(df: pd.DataFrame) -> pd.DataFrame:
    """Root nodes only (soma seeds) — the 'seed' output format of the
    reference converter."""
    return df[df["parent_id"] == -1][["x", "y", "z", "radius"]].copy()
