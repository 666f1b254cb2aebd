"""Flip a TIFF series on x/y axes (reference flip_script.py:1-114)."""

from __future__ import annotations

import argparse
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from ..io import tiff as tio
from ..utils.progress import ProgressReporter

__all__ = ["flip_series", "main"]


def flip_series(input_dir: Path, output_dir: Path, flip_x: bool = False,
                flip_y: bool = False, workers: int = 8) -> int:
    input_dir = Path(input_dir)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    paths = sorted(p for p in input_dir.iterdir()
                   if p.suffix.lower() in (".tif", ".tiff"))
    prog = ProgressReporter(len(paths), desc="flip")

    def one(p: Path):
        img = tio.imread(p)
        if flip_y:
            img = img[::-1]
        if flip_x:
            img = img[:, ::-1]
        tio.imwrite(output_dir / p.name, np.ascontiguousarray(img))
        prog.step()

    with ThreadPoolExecutor(workers) as pool:
        list(pool.map(one, paths))
    prog.close()
    return len(paths)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="flip TIFF series")
    p.add_argument("--input", "-i", required=True, type=Path)
    p.add_argument("--output", "-o", required=True, type=Path)
    p.add_argument("--flip-x", action="store_true")
    p.add_argument("--flip-y", action="store_true")
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args(argv)
    flip_series(args.input, args.output, args.flip_x, args.flip_y,
                args.workers)
    return 0


if __name__ == "__main__":
    sys.exit(main())
