"""Parallel converter CLI — the top-level convert.py equivalent.

(reference convert.py:23-404: IMS/TIFF dir -> preprocessed TIFF series
with optional 8-bit/destripe/resize, then TeraFly / Imaris / downsampled
npz exports — the reference shells out to MPI paraconverter and wine
ImarisConvertiv; here the exports are native: ipp_tpu.io.terafly and
ipp_tpu.io.ims.)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import Optional

import numpy as np

from ..io import tiff as tio
from ..io.ims import ImarisReader, tif_series_to_imaris
from ..io.terafly import tif_series_to_terafly
from ..ops.process import ProcessConfig, process_img
from ..utils.jaxconfig import enable_persistent_cache
from ..utils.log import Logger
from ..utils.progress import ProgressReporter

__all__ = ["convert", "main"]


def _open_source(src: Path):
    """Return (reader(z)->plane, nz).  Source: .ims file or TIFF dir."""
    if src.suffix.lower() == ".ims":
        r = ImarisReader(src)
        return (lambda z: r[z]), r.shape[0]
    paths = sorted(p for p in src.iterdir()
                   if p.suffix.lower() in (".tif", ".tiff"))
    if not paths:
        raise FileNotFoundError(f"no TIFFs in {src}")
    return (lambda z: tio.imread(paths[z])), len(paths)


def convert(
    source: Path,
    destination: Path,
    cfg: Optional[ProcessConfig] = None,
    voxel_um=(1.0, 1.0, 1.0),
    to_terafly: bool = False,
    to_imaris: bool = False,
    resume: bool = False,
    log: Optional[Logger] = None,
) -> Path:
    enable_persistent_cache()
    log = log or Logger()
    reader, nz = _open_source(Path(source))
    tif_dir = Path(destination)
    tif_dir.mkdir(parents=True, exist_ok=True)
    prog = ProgressReporter(nz, desc="convert")
    for z in range(nz):
        out = tif_dir / f"img_{z:06d}.tif"
        if resume and out.exists():
            prog.step()
            continue
        plane = np.asarray(reader(z))
        if cfg is not None:
            plane = process_img(plane, cfg)
        tio.imwrite(out, plane)
        prog.step()
    prog.close()
    if to_terafly:
        log.info("building TeraFly pyramid ...")
        tif_series_to_terafly(tif_dir, tif_dir.parent / (tif_dir.name + "_terafly"),
                              voxel_um=voxel_um)
    if to_imaris:
        log.info("writing Imaris file ...")
        tif_series_to_imaris(tif_dir, tif_dir.parent / (tif_dir.name + ".ims"),
                             voxel_um=voxel_um)
    return tif_dir


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="convert IMS/TIFF volumes "
                                            "(convert.py equivalent)")
    p.add_argument("--input", "-i", required=True, type=Path)
    p.add_argument("--output", "-o", required=True, type=Path)
    p.add_argument("--convert-to-8bit", action="store_true")
    p.add_argument("--bit-shift", type=int, default=8)
    p.add_argument("--dark", type=float, default=0.0)
    p.add_argument("--sigma1", type=float, default=0.0)
    p.add_argument("--sigma2", type=float, default=0.0)
    p.add_argument("--wavelet", default="db9")
    p.add_argument("--new-size", type=int, nargs=2, default=None)
    p.add_argument("--voxel", type=float, nargs=3, default=(1.0, 1.0, 1.0),
                   metavar=("Z", "Y", "X"))
    p.add_argument("--terafly", action="store_true")
    p.add_argument("--imaris", action="store_true")
    p.add_argument("--resume", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = None
    if (args.convert_to_8bit or args.dark or args.sigma1 or args.sigma2
            or args.new_size):
        cfg = ProcessConfig(
            sigma=(args.sigma1, args.sigma2), wavelet=args.wavelet,
            dark=args.dark, convert_to_8bit=args.convert_to_8bit,
            bit_shift_to_right=args.bit_shift,
            new_size=tuple(args.new_size) if args.new_size else None)
    convert(args.input, args.output, cfg, voxel_um=tuple(args.voxel),
            to_terafly=args.terafly, to_imaris=args.imaris,
            resume=args.resume)
    return 0


if __name__ == "__main__":
    sys.exit(main())
