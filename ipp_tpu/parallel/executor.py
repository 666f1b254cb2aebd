"""Streaming tile executor: host IO threads feeding batched device calls.

Replaces the reference's process-pool runtimes (pystripe
MultiProcessQueueRunner, pystripe/core.py:1687-1771; parallel_image_processor
MultiProcess, parallel_image_processor.py:219-445) with a single-process
design suited to one-accelerator-many-cores hosts:

- reader threads decode tiles into a bounded queue (backpressure = the
  reference's RAM admission semaphore, parallel_image_processor.py:210-217),
- tiles of equal shape are batched and processed by one jitted device call
  (amortizing dispatch; XLA overlaps H2D/compute/D2H),
- writer threads commit outputs atomically,
- failures: a corrupt/hung read is replaced by a zero tile and counted
  (the reference's timeout->dummy fallback, pystripe/core.py:1730-1755),
- resume: existing outputs are skipped (pystripe/core.py:1511).
"""

from __future__ import annotations

import queue
import threading
import traceback
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..io import tiff as tio
from ..utils.progress import ProgressReporter

__all__ = ["TileTask", "run_tile_pipeline"]


@dataclass
class TileTask:
    input_path: Path
    output_path: Path


@dataclass
class _Batch:
    tasks: List[TileTask]
    imgs: List[np.ndarray]


def run_tile_pipeline(
    tasks: Sequence[TileTask],
    process_batch: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 8,
    reader_threads: int = 8,
    writer_threads: int = 4,
    resume: bool = False,
    compression: Optional[str] = None,
    progress_desc: str = "tiles",
    reader: Optional[Callable[[Path], np.ndarray]] = None,
    read_timeout: float = 300.0,
) -> Dict[str, int]:
    """Run `process_batch` over all tasks; returns counters
    {'done', 'skipped', 'failed'}."""
    tasks = [t for t in tasks]
    counters = {"done": 0, "skipped": 0, "failed": 0}
    lock = threading.Lock()
    if resume:
        remaining = []
        for t in tasks:
            if t.output_path.exists():
                counters["skipped"] += 1
            else:
                remaining.append(t)
        tasks = remaining
    if not tasks:
        return counters

    read_fn = reader or tio.imread
    prog = ProgressReporter(len(tasks), desc=progress_desc)
    in_q: "queue.Queue[Optional[Tuple[TileTask, Optional[np.ndarray]]]]" = (
        queue.Queue(maxsize=4 * batch_size))
    out_q: "queue.Queue[Optional[Tuple[TileTask, np.ndarray]]]" = (
        queue.Queue(maxsize=4 * batch_size))

    task_iter = iter(tasks)
    iter_lock = threading.Lock()

    from concurrent.futures import ThreadPoolExecutor as _TPE
    from concurrent.futures import TimeoutError as _FTimeout

    timeout_pool = _TPE(max_workers=reader_threads)

    def read_worker():
        while True:
            with iter_lock:
                t = next(task_iter, None)
            if t is None:
                in_q.put(None)
                return
            try:
                # timeout sandbox: a hung/corrupt read becomes a zero tile
                # (reference 1-task inner pool with timeout,
                # pystripe/core.py:1710-1755)
                img = np.asarray(
                    timeout_pool.submit(read_fn, t.input_path)
                    .result(timeout=read_timeout))
            except _FTimeout:
                print(f"read timeout, substituting zeros: {t.input_path}")
                img = None
            except Exception:
                traceback.print_exc()
                img = None  # zero-tile substitution downstream
            in_q.put((t, img))

    def write_worker():
        while True:
            item = out_q.get()
            if item is None:
                return
            t, img = item
            try:
                t.output_path.parent.mkdir(parents=True, exist_ok=True)
                tio.imwrite(t.output_path, img, compression=compression)
                with lock:
                    counters["done"] += 1
            except Exception:
                traceback.print_exc()
                with lock:
                    counters["failed"] += 1
            prog.step()

    readers = [threading.Thread(target=read_worker, daemon=True)
               for _ in range(reader_threads)]
    writers = [threading.Thread(target=write_worker, daemon=True)
               for _ in range(writer_threads)]
    for th in readers + writers:
        th.start()

    # batch by shape/dtype so each jit executable sees uniform batches
    pending: Dict[Tuple, _Batch] = {}
    finished_readers = 0

    def flush(key):
        b = pending.pop(key, None)
        if b is None or not b.imgs:
            return
        batch = np.stack(b.imgs)
        try:
            out = np.asarray(process_batch(batch))
            assert out.shape[0] == batch.shape[0]
            for t, o in zip(b.tasks, out):
                out_q.put((t, o))
        except Exception:
            traceback.print_exc()
            with lock:
                counters["failed"] += len(b.tasks)
            for _ in b.tasks:
                prog.step()

    shape_hint: Optional[Tuple] = None
    while finished_readers < reader_threads:
        item = in_q.get()
        if item is None:
            finished_readers += 1
            continue
        t, img = item
        if img is None:
            if shape_hint is not None:
                img = np.zeros(shape_hint[0], shape_hint[1])
                with lock:
                    counters["failed"] += 1
            else:
                with lock:
                    counters["failed"] += 1
                prog.step()
                continue
        shape_hint = (img.shape, img.dtype)
        key = (img.shape, str(img.dtype))
        b = pending.setdefault(key, _Batch([], []))
        b.tasks.append(t)
        b.imgs.append(img)
        if len(b.imgs) >= batch_size:
            flush(key)
    for key in list(pending):
        flush(key)

    for _ in writers:
        out_q.put(None)
    for th in writers:
        th.join()
    timeout_pool.shutdown(wait=False)
    prog.close()
    return counters
