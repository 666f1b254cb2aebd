"""Batch destriping CLI — the pystripe equivalent.

Mirrors `python -m pystripe` (reference pystripe/core.py:2052-2189
argparse surface and batch_filter :1806-2050): destripe/flat/dark/8-bit a
directory tree of tiles into a mirrored output tree, with resume and
robust IO, but running as batched jitted device calls instead of a process
pool.

Usage: python -m ipp_tpu.pipeline.pystripe_cli --input DIR [--output DIR]
          --sigma1 250 --sigma2 250 [...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..io import tiff as tio
from ..ops.process import ProcessConfig, process_img
from ..parallel.executor import TileTask, run_tile_pipeline
from ..utils.jaxconfig import enable_persistent_cache
from ..utils.log import Logger

__all__ = ["batch_filter", "main"]

SUPPORTED_EXTENSIONS = (".tif", ".tiff", ".raw", ".png")


def collect_tasks(input_dir: Path, output_dir: Path,
                  extensions=SUPPORTED_EXTENSIONS) -> List[TileTask]:
    """Mirror the input tree into output, one task per image
    (reference glob in batch_filter, pystripe/core.py:1997-2019)."""
    tasks = []
    for p in sorted(input_dir.rglob("*")):
        if p.suffix.lower() in extensions and p.is_file():
            rel = p.relative_to(input_dir)
            out = (output_dir / rel).with_suffix(".tif")
            tasks.append(TileTask(p, out))
    return tasks


def batch_filter(input_dir: Path, output_dir: Path, cfg: ProcessConfig,
                 batch_size: int = 8, resume: bool = False,
                 compression: Optional[str] = None,
                 workers: int = 8) -> dict:
    """Destripe a whole directory tree (reference batch_filter,
    pystripe/core.py:1806-2050).

    With more than one device the tile batch shard_maps over the mesh's
    'data' axis — each device destripes its local tiles with the same
    compiled program (the reference's per-GPU queue, pystripe/core.py:
    2021-2037, without token passing)."""
    enable_persistent_cache()
    tasks = collect_tasks(Path(input_dir), Path(output_dir))
    if not tasks:
        raise FileNotFoundError(f"no images under {input_dir}")

    import jax

    from ..ops.process import _out_meta, is_uniform_2d

    n_dev = len(jax.devices())
    sharded_fn = None
    if n_dev > 1:
        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import make_mesh

        mesh = make_mesh(n_dev, z_parallel=1)
        spec = P("data", None, None)
        batch_size = max(batch_size, n_dev) // n_dev * n_dev
        from ..parallel.mesh import shard_map_compat

        sharded_fn = jax.jit(shard_map_compat(
            lambda b: process_img(b, cfg), mesh=mesh,
            in_specs=spec, out_specs=spec))

    def proc_batch(batch: np.ndarray) -> np.ndarray:
        # the device path handles whole batches; uniform tiles short-circuit
        # to zeros host-side (reference is_uniform_2d, pystripe/core.py:1241)
        uniform = [i for i, b in enumerate(batch) if is_uniform_2d(b)]
        work = [i for i in range(len(batch)) if i not in uniform]
        results = {}
        if work:
            stacked = np.stack([batch[i] for i in work])
            if sharded_fn is not None:
                n = stacked.shape[0]
                n_pad = (-n) % n_dev  # shard_map needs even division
                if n_pad:
                    stacked = np.concatenate(
                        [stacked, np.repeat(stacked[-1:], n_pad, 0)])
                processed = np.asarray(sharded_fn(stacked))[:n]
            else:
                processed = process_img(stacked, cfg)
            for i, o in zip(work, processed):
                results[i] = o
        for i in uniform:
            tile, dt = _out_meta(batch[i].shape, cfg, batch[i].dtype)
            results[i] = np.zeros(tile, dt)
        return np.stack([results[i] for i in range(len(batch))])

    return run_tile_pipeline(tasks, proc_batch,
                             batch_size=batch_size, resume=resume,
                             compression=compression,
                             reader_threads=workers,
                             progress_desc="destripe")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Batch destriping (pystripe-compatible flags)")
    p.add_argument("--input", "-i", required=True, type=Path)
    p.add_argument("--output", "-o", type=Path, default=None)
    p.add_argument("--sigma1", "-s1", type=float, default=0,
                   help="foreground destripe sigma")
    p.add_argument("--sigma2", "-s2", type=float, default=0,
                   help="background destripe sigma")
    p.add_argument("--level", "-l", type=int, default=0)
    p.add_argument("--wavelet", "-w", type=str, default="db10")
    p.add_argument("--crossover", "-x", type=float, default=10)
    p.add_argument("--threshold", "-t", type=float, default=None)
    p.add_argument("--bidirectional", action="store_true")
    p.add_argument("--dark", "-d", type=float, default=0)
    p.add_argument("--flat", "-f", type=Path, default=None)
    p.add_argument("--gaussian", action="store_true",
                   help="2D gaussian denoise before destriping")
    p.add_argument("--lightsheet", action="store_true")
    p.add_argument("--artifact-length", type=int, default=150)
    p.add_argument("--convert-to-16bit", action="store_true")
    p.add_argument("--convert-to-8bit", action="store_true")
    p.add_argument("--bit-shift", type=int, default=8)
    p.add_argument("--down-sample", type=int, nargs=2, default=None)
    p.add_argument("--new-size", type=int, nargs=2, default=None)
    p.add_argument("--rotate", type=int, default=0, choices=[0, 90, 180, 270])
    p.add_argument("--flip-upside-down", action="store_true")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--compression", type=str, default=None,
                   choices=[None, "zlib"])
    p.add_argument("--resume", "--continue", dest="resume",
                   action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    log = Logger()
    out = args.output or args.input.parent / (args.input.name + "_destriped")
    flat = None
    if args.flat is not None:
        flat = tio.imread(args.flat).astype(np.float32)
        flat /= flat.max()
    cfg = ProcessConfig(
        flat=flat,
        gaussian_filter_2d=args.gaussian,
        down_sample=tuple(args.down_sample) if args.down_sample else None,
        new_size=tuple(args.new_size) if args.new_size else None,
        sigma=(args.sigma1, args.sigma2),
        level=args.level, wavelet=args.wavelet, crossover=args.crossover,
        threshold=args.threshold, bidirectional=args.bidirectional,
        dark=args.dark, lightsheet=args.lightsheet,
        artifact_length=args.artifact_length,
        rotate=args.rotate, flip_upside_down=args.flip_upside_down,
        convert_to_16bit=args.convert_to_16bit,
        convert_to_8bit=args.convert_to_8bit,
        bit_shift_to_right=args.bit_shift)
    log.info(f"destriping {args.input} -> {out}")
    counters = batch_filter(args.input, out, cfg, batch_size=args.batch_size,
                            resume=args.resume, compression=args.compression,
                            workers=args.workers)
    log.info(f"done: {counters}")
    return 1 if counters["failed"] else 0


if __name__ == "__main__":
    sys.exit(main())
