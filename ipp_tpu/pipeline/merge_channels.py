"""Channel merge CLI (reference merge_channels.py:1-102, wrapping
process_images.merge_all_channels): align stitched channel series and write
RGB composites."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from ..io import tiff as tio
from ..utils.log import Logger
from .align_channels import align_volumes, write_composite_series

__all__ = ["main"]


def _load_central_block(tif_dir: Path, max_planes: int = 32) -> np.ndarray:
    paths = sorted(tif_dir.glob("*.tif"))
    n = len(paths)
    z0 = max(0, n // 2 - max_planes // 2)
    planes = [tio.imread(p) for p in paths[z0:z0 + max_planes]]
    return np.stack(planes).astype(np.float32)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="align channels and write RGB composites")
    p.add_argument("--red", type=Path, default=None)
    p.add_argument("--green", type=Path, default=None)
    p.add_argument("--blue", type=Path, default=None)
    p.add_argument("--output", "-o", required=True, type=Path)
    p.add_argument("--no-align", action="store_true")
    args = p.parse_args(argv)
    log = Logger()

    channels = {}
    colors = {}
    for name, color in (("red", "r"), ("green", "g"), ("blue", "b")):
        path = getattr(args, name)
        if path is not None:
            channels[name] = path
            colors[name] = color
    if not channels:
        log.error("no channels given")
        return 2

    offsets = {}
    if not args.no_align and len(channels) > 1:
        ref_name = next(iter(channels))
        ref_block = _load_central_block(channels[ref_name])
        for name, path in channels.items():
            if name == ref_name:
                offsets[name] = (0, 0, 0)
                continue
            block = _load_central_block(path)
            hh = min(ref_block.shape[0], block.shape[0])
            hy = min(ref_block.shape[1], block.shape[1])
            hx = min(ref_block.shape[2], block.shape[2])
            _, off = align_volumes(ref_block[:hh, :hy, :hx],
                                   block[:hh, :hy, :hx])
            offsets[name] = off
            log.info(f"channel {name} offset {off}")
    write_composite_series(channels, colors, args.output, offsets)
    return 0


if __name__ == "__main__":
    sys.exit(main())
