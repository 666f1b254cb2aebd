"""Piezo-stack scanner alignment — the tsv/scan.py equivalent.

Re-design of the reference's "dragonfly" aligner (tsv/scan.py:31-1143):
a 3D grid of ScanStacks (x, y, z indices) with per-stack drift, aligned
pairwise along x, y AND z.  The reference correlates dark-thresholded
decimated planes per candidate shift in process pools; here each adjacent
pair goes through the batched all-shifts NCC engine (ops/ncc.align_pair
with sides we/ns/tb), and blending uses distance-to-edge weights
(the reference's EDT-weighted blend — exact for box-shaped stacks as a
separable min-ramp).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..geometry.extent import VExtent
from ..io import tiff as tio
from ..ops.ncc import NCCParams, align_pair
from ..utils.log import Logger

__all__ = ["ScanStack", "Scanner"]


@dataclass
class ScanStack:
    """One piezo substack: z-ordered plane files at a nominal (x0, y0, z0)
    (reference ScanStack, tsv/scan.py:31-133)."""

    paths: List[Path]
    x0: int
    y0: int
    z0: int
    drift_x: float = 0.0  # per-z linear drift (reference AverageDrift)
    drift_y: float = 0.0
    _shape: Optional[Tuple[int, int]] = field(default=None, repr=False)

    @property
    def plane_shape(self) -> Tuple[int, int]:
        if self._shape is None:
            self._shape = tio.imread(self.paths[0]).shape
        return self._shape

    @property
    def extent(self) -> VExtent:
        h, w = self.plane_shape
        return VExtent(self.x0, self.x0 + w, self.y0, self.y0 + h,
                       self.z0, self.z0 + len(self.paths))

    def read_plane(self, z: int) -> np.ndarray:
        return tio.imread(self.paths[z])

    def read_volume(self, dark: float = 0.0) -> np.ndarray:
        vol = np.stack([self.read_plane(z) for z in range(len(self.paths))])
        vol = vol.astype(np.float32)
        if dark > 0:
            vol = np.maximum(vol - dark, 0.0)
        return vol


class Scanner:
    """3D grid of ScanStacks with pairwise alignment and weighted blending
    (reference Scanner, tsv/scan.py:161-1143)."""

    def __init__(self, stacks: Dict[Tuple[int, int, int], ScanStack],
                 dark: float = 0.0, slop: Tuple[int, int, int] = (10, 10, 5),
                 params: Optional[NCCParams] = None,
                 log: Optional[Logger] = None):
        self.stacks = dict(stacks)
        self.dark = dark
        self.slop = slop
        self.params = params or NCCParams(min_dim_ncc_src=8)
        self.log = log or Logger()
        self.alignments: Dict[Tuple, Tuple[int, int, int]] = {}

    def _overlap(self, a: ScanStack, b: ScanStack, side: str) -> int:
        ea, eb = a.extent, b.extent
        if side == "we":
            return max(1, ea.x1 - eb.x0)
        if side == "ns":
            return max(1, ea.y1 - eb.y0)
        return max(1, ea.z1 - eb.z0)

    def align_all_stacks(self) -> None:
        """Pairwise NCC alignment of every adjacent pair along x, y, z
        (reference align_all_stacks, tsv/scan.py:327-460)."""
        keys = set(self.stacks)
        neighbors = {"we": (1, 0, 0), "ns": (0, 1, 0), "tb": (0, 0, 1)}
        sx, sy, sz = self.slop
        for (xi, yi, zi), s0 in sorted(self.stacks.items()):
            for side, (dx, dy, dz) in neighbors.items():
                k1 = (xi + dx, yi + dy, zi + dz)
                if k1 not in keys:
                    continue
                s1 = self.stacks[k1]
                overlap = self._overlap(s0, s1, side)
                va = s0.read_volume(self.dark)
                vb = s1.read_volume(self.dark)
                d = min(va.shape[0], vb.shape[0])
                res = align_pair(va[:d], vb[:d], side, overlap,
                                 sy, sx, sz, self.params)
                self.alignments[((xi, yi, zi), k1)] = res.coord
                self.log.info(
                    f"scan align {side} {(xi, yi, zi)}->{k1}: "
                    f"coord={res.coord} peak={tuple(round(p, 3) for p in res.ncc_peak)}")

    def apply_alignments(self) -> None:
        """Chain pairwise results into absolute stack positions (first-found
        spanning order), then rebase to zero."""
        if not self.alignments:
            return
        pos: Dict[Tuple[int, int, int], Tuple[int, int, int]] = {}
        first = sorted(self.stacks)[0]
        pos[first] = (self.stacks[first].x0, self.stacks[first].y0,
                      self.stacks[first].z0)
        changed = True
        while changed:
            changed = False
            for (k0, k1), (cv, ch, cd) in self.alignments.items():
                if k0 in pos and k1 not in pos:
                    x, y, z = pos[k0]
                    pos[k1] = (x + ch, y + cv, z + cd)
                    changed = True
                elif k1 in pos and k0 not in pos:
                    x, y, z = pos[k1]
                    pos[k0] = (x - ch, y - cv, z - cd)
                    changed = True
        for k, s in self.stacks.items():
            if k in pos:
                s.x0, s.y0, s.z0 = pos[k]
        mx = min(s.x0 for s in self.stacks.values())
        my = min(s.y0 for s in self.stacks.values())
        mz = min(s.z0 for s in self.stacks.values())
        for s in self.stacks.values():
            s.x0 -= mx
            s.y0 -= my
            s.z0 -= mz

    @property
    def volume(self) -> VExtent:
        exts = [s.extent for s in self.stacks.values()]
        return VExtent(min(e.x0 for e in exts), max(e.x1 for e in exts),
                       min(e.y0 for e in exts), max(e.y1 for e in exts),
                       min(e.z0 for e in exts), max(e.z1 for e in exts))

    def imread(self, volume: VExtent, dtype=np.uint16) -> np.ndarray:
        """Distance-to-edge weighted blend of all intersecting stacks
        (reference Scanner EDT blending; exact for box stacks)."""
        acc = np.zeros(volume.shape, np.float32)
        wacc = np.zeros(volume.shape, np.float32)
        for s in self.stacks.values():
            ext = s.extent
            if not ext.intersects(volume):
                continue
            inter = ext.intersection(volume)
            block = np.stack([
                s.read_plane(z - s.z0)[inter.y0 - s.y0:inter.y1 - s.y0,
                                       inter.x0 - s.x0:inter.x1 - s.x0]
                for z in range(inter.z0, inter.z1)]).astype(np.float32)
            # separable distance-to-edge weight (EDT of a box)
            w = np.ones(inter.shape, np.float32)
            for ax, (lo, hi, elo, ehi) in enumerate((
                    (inter.z0, inter.z1, ext.z0, ext.z1),
                    (inter.y0, inter.y1, ext.y0, ext.y1),
                    (inter.x0, inter.x1, ext.x0, ext.x1))):
                coords = np.arange(lo, hi)
                dist = np.minimum(coords - elo + 1, ehi - coords)
                shape = [1, 1, 1]
                shape[ax] = len(coords)
                w = w * dist.reshape(shape).astype(np.float32)
            sl = volume.local_slices(inter)
            acc[sl] += block * w
            wacc[sl] += w
        out = np.where(wacc > 0, acc / np.maximum(wacc, 1e-12), 0.0)
        if np.issubdtype(np.dtype(dtype), np.integer):
            info = np.iinfo(dtype)
            out = np.clip(np.rint(out), info.min, info.max)
        return out.astype(dtype)
