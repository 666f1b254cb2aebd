"""Steps 3-5 — displacement projection, thresholding, global placement.

Host-side graph algorithms on tiny data (rows x cols tiles), re-implementing:

- step 3 projectDisplacements (reference StackStitcher.cpp:1563-1618 +
  Displacement::projectDisplacements, Displacement.cpp:84-107 +
  DisplacementMIPNCC::combine, DisplacementMIPNCC.cpp:310-345): per-axis
  keep the most reliable candidate across z-subvolumes; missing neighbors
  get the nominal stage displacement.
- step 4 thresholdDisplacements (reference StackStitcher.cpp:1619-1720):
  reliability below threshold resets that axis to the default displacement
  and zeroes its reliability; tiles with no reliable link on any axis to any
  neighbor are marked NON-STITCHABLE.
- step 5 TPAlgoMST (reference TPAlgoMST.cpp:66-230): per-axis Bellman-Ford
  relaxation over the 4-neighbor grid with weight = 1/reliability (clamped
  at S_UNRELIABLE_WEIGHT), source = stitchable tile nearest the origin;
  absolute positions accumulate displacements along shortest paths.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np

from ..geometry.stacks import Displacement, TileGrid

__all__ = ["project_displacements", "threshold_displacements",
           "place_tiles_mst", "place_tiles_lqp"]

S_UNRELIABLE_WEIGHT = 1000.0  # reference S_config.h:89


def _combine(a: Displacement, b: Displacement) -> Displacement:
    """Per-axis most-reliable merge (reference DisplacementMIPNCC::combine)."""
    displ, default, rel, peak, width, wrt, invw, delay = ([], [], [], [], [],
                                                          [], [], [])
    for k in range(3):
        src = a if a.reliability[k] >= b.reliability[k] else b
        displ.append(src.displ[k])
        default.append(src.default_displ[k])
        rel.append(src.reliability[k])
        peak.append(src.ncc_peak[k])
        width.append(src.ncc_width[k])
        wrt.append(src.ncc_w_range_thr[k])
        invw.append(src.ncc_inv_width[k])
        delay.append(src.delay[k])
    return Displacement(tuple(displ), tuple(default), tuple(rel), tuple(peak),
                        tuple(width), tuple(wrt), tuple(invw), tuple(delay))


def _nominal(grid: TileGrid, side: str, overlap_v: int, overlap_h: int,
             sign: int = 1) -> Displacement:
    th, tw = grid.flattened()[0].plane_shape
    if side == "north":
        d = (-(th - overlap_v), 0, 0)
    else:
        d = (0, -(tw - overlap_h), 0)
    d = tuple(sign * x for x in d)
    # nominal displacements carry zero reliability and max width
    # (reference DisplacementMIPNCC(int,int,int) ctor)
    return Displacement(displ=d, default_displ=d,
                        reliability=(0.0, 0.0, 0.0), ncc_peak=(0.0, 0.0, 0.0),
                        ncc_width=(100, 100, 100),
                        ncc_w_range_thr=(99, 99, 99),
                        ncc_inv_width=(100, 100, 100), delay=(-1, -1, -1))


def project_displacements(
    grid: TileGrid,
    candidates: Dict[Tuple[int, int, str], List[Displacement]],
    overlap_v: int, overlap_h: int,
) -> None:
    """Attach one projected NORTH/WEST displacement to every non-edge stack."""
    for r in range(grid.n_rows):
        for c in range(grid.n_cols):
            s = grid.stacks[r][c]
            if r > 0:
                cands = candidates.get((r, c, "north"), [])
                if cands:
                    d = cands[0]
                    for other in cands[1:]:
                        d = _combine(d, other)
                    s.north = d
                else:
                    s.north = _nominal(grid, "north", overlap_v, overlap_h)
            if c > 0:
                cands = candidates.get((r, c, "west"), [])
                if cands:
                    d = cands[0]
                    for other in cands[1:]:
                        d = _combine(d, other)
                    s.west = d
                else:
                    s.west = _nominal(grid, "west", overlap_v, overlap_h)


def threshold_displacements(grid: TileGrid, reliability_threshold: float) -> None:
    """Reset unreliable displacement axes to defaults; mark tiles with no
    reliable link as NON-STITCHABLE (reference StackStitcher.cpp:1619-1720)."""

    def threshold_one(d: Displacement) -> Displacement:
        displ = list(d.displ)
        rel = list(d.reliability)
        for k in range(3):
            if rel[k] < reliability_threshold:
                displ[k] = d.default_displ[k]
                rel[k] = 0.0
        return Displacement(tuple(displ), d.default_displ, tuple(rel),
                            d.ncc_peak, d.ncc_width, d.ncc_w_range_thr,
                            d.ncc_inv_width, d.delay)

    rows, cols = grid.n_rows, grid.n_cols
    for r in range(rows):
        for c in range(cols):
            s = grid.stacks[r][c]
            if s.north is not None:
                s.north = threshold_one(s.north)
            if s.west is not None:
                s.west = threshold_one(s.west)
    # stitchable check: any axis of any adjacent link >= threshold
    for r in range(rows):
        for c in range(cols):
            s = grid.stacks[r][c]
            links = [s.north, s.west]
            if r + 1 < rows:
                links.append(grid.stacks[r + 1][c].north)
            if c + 1 < cols:
                links.append(grid.stacks[r][c + 1].west)
            s.stitchable = any(
                d is not None and max(d.reliability) >= reliability_threshold
                for d in links)


def place_tiles_mst(grid: TileGrid) -> None:
    """Per-axis shortest-path placement (reference TPAlgoMST.cpp:66-230).

    Edge (r,c)->(r+1,c) uses the NORTH displacement stored on (r+1,c)
    (mirrored semantics: child position = parent position - displ) and the
    WEST analog for columns.  Weight = 1/reliability clamped to
    S_UNRELIABLE_WEIGHT.
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import dijkstra

    rows, cols = grid.n_rows, grid.n_cols
    n = rows * cols
    # source: stitchable tile nearest the origin
    src = (0, 0)
    best = math.inf
    for r in range(rows):
        for c in range(cols):
            if grid.stacks[r][c].stitchable and math.hypot(r, c) < best:
                best = math.hypot(r, c)
                src = (r, c)

    def node(r: int, c: int) -> int:
        return r * cols + c

    # gather the grid's links once: (u, v, displ-per-axis, rel-per-axis)
    # where v is the southern/eastern tile carrying the link
    links = []
    for r in range(rows):
        for c in range(cols):
            if r + 1 < rows:
                d = grid.stacks[r + 1][c].north
                links.append((node(r, c), node(r + 1, c),
                              d.displ if d else (0, 0, 0),
                              d.reliability if d else (0.0, 0.0, 0.0)))
            if c + 1 < cols:
                d = grid.stacks[r][c + 1].west
                links.append((node(r, c), node(r, c + 1),
                              d.displ if d else (0, 0, 0),
                              d.reliability if d else (0.0, 0.0, 0.0)))
    if not links:  # single-tile grid: nothing to place
        s = grid.stacks[0][0]
        s.abs_v = s.abs_h = s.abs_d = 0
        return
    us = np.array([e[0] for e in links])
    vs = np.array([e[1] for e in links])
    displ = np.array([e[2] for e in links], dtype=np.int64)  # (E, 3)
    rel = np.array([e[3] for e in links], dtype=np.float64)

    abs_coord = np.zeros((rows, cols, 3), dtype=np.int64)
    for k in range(3):
        w = np.where(rel[:, k] > 1e-9, 1.0 / np.maximum(rel[:, k], 1e-9),
                     S_UNRELIABLE_WEIGHT)
        w = np.minimum(w, S_UNRELIABLE_WEIGHT)
        g = coo_matrix((w, (us, vs)), shape=(n, n))
        dist, pred = dijkstra(g, directed=False, indices=node(*src),
                              return_predecessors=True)
        # displacement lookup per (parent, child) pair: child = parent - displ
        edge_d = {}
        for (u, v, d) in zip(us, vs, displ[:, k]):
            edge_d[(u, v)] = -int(d)   # moving u -> v
            edge_d[(v, u)] = int(d)
        # accumulate along predecessor chains in distance order: position of
        # each node is defined once its predecessor's is (O(V log V))
        order = np.argsort(dist)
        pos = np.zeros(n, dtype=np.int64)
        for v in order:
            p = pred[v]
            if p < 0:  # the source (or an unreachable node: stays 0)
                continue
            pos[v] = pos[p] + edge_d[(int(p), int(v))]
        abs_coord[:, :, k] = pos.reshape(rows, cols)

    # rebase to non-negative (reference TPAlgoMST step 5 rebases to [0][0];
    # we rebase to the min like the TSV consumer, tsv/volume.py:775-790)
    abs_coord -= abs_coord.min(axis=(0, 1), keepdims=True)
    for r in range(rows):
        for c in range(cols):
            s = grid.stacks[r][c]
            s.abs_v = int(abs_coord[r, c, 0])
            s.abs_h = int(abs_coord[r, c, 1])
            s.abs_d = int(abs_coord[r, c, 2])


def place_tiles_lqp(grid: TileGrid) -> None:
    """Global placement as a reliability-weighted least-squares problem
    (the TPAlgoLQP alternative to the MST; reference TPAlgoLQP.cpp +
    pyscripts/LQP_HE.py solve an integer quadratic program — here the
    relaxed LS problem per axis, solved exactly by a sparse normal system,
    then rounded; unlike the MST it reconciles loop inconsistencies by
    spreading error over all edges).

    minimize per axis k:  sum_edges w_e * (p[child] - p[parent] - d_e,k)^2
    with p[0,0] fixed at 0; w_e = max(reliability_k, eps).
    """
    from scipy.sparse import lil_matrix
    from scipy.sparse.linalg import lsqr

    rows, cols = grid.n_rows, grid.n_cols
    n = rows * cols

    def node(r: int, c: int) -> int:
        return r * cols + c

    abs_coord = np.zeros((rows, cols, 3), dtype=np.int64)
    for k in range(3):
        edges = []
        for r in range(rows):
            for c in range(cols):
                s = grid.stacks[r][c]
                # NORTH link: p[r,c] = p[r-1,c] - displ_k
                if r > 0 and s.north is not None:
                    w = max(s.north.reliability[k], 1e-3)
                    edges.append((node(r - 1, c), node(r, c),
                                  -s.north.displ[k], w))
                if c > 0 and s.west is not None:
                    w = max(s.west.reliability[k], 1e-3)
                    edges.append((node(r, c - 1), node(r, c),
                                  -s.west.displ[k], w))
        A = lil_matrix((len(edges) + 1, n))
        b = np.zeros(len(edges) + 1)
        for i, (u, v, d, w) in enumerate(edges):
            sw = math.sqrt(w)
            A[i, v] = sw
            A[i, u] = -sw
            b[i] = sw * d
        A[len(edges), 0] = 1000.0  # anchor p[0,0] = 0
        sol = lsqr(A.tocsr(), b)[0]
        abs_coord[:, :, k] = np.rint(sol).reshape(rows, cols)

    abs_coord -= abs_coord.min(axis=(0, 1), keepdims=True)
    for r in range(rows):
        for c in range(cols):
            s = grid.stacks[r][c]
            s.abs_v = int(abs_coord[r, c, 0])
            s.abs_h = int(abs_coord[r, c, 1])
            s.abs_d = int(abs_coord[r, c, 2])
