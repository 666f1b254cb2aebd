"""Benchmark — prints ONE JSON line with the headline metric.

Headline: Richardson-Lucy FFT deconvolution CORE throughput per chip —
the production block config (the lane-aligned overlap-save block that
pipeline.deconvolve.autosplit plans for the reference's own 835.7-Gvox
benchmark volume, 16-voxel discarded halo, synthetic gaussian PSF, 10
iterations), counting only the core voxels each block contributes to the
output.  A 256^3-block measurement rides in extras for cross-round
comparability (rounds 1-3 used 256^3 as the headline).
Reference baseline: 27.6 Mvox/s/GPU — the 8x A100 FFT-domain run of
LsDeconvolveMultiGPU (221 Mvox/s / 8, LsDeconvolveMultiGPU/README.md:61;
see BASELINE.md), which likewise counts output voxels per wall-clock.

All secondary stage metrics (destripe, lightsheet, NCC, merge blend,
preprocess-with-IO, e2e stitch with per-stage splits) ride in the SAME
JSON line under "extra", so every round's BENCH_rNN.json captures the
whole stage surface, not just the headline (VERDICT r2 items 3/4).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import json
import sys
import time

import numpy as np

metrics = {}


def _note(key, value, text):
    metrics[key] = round(value, 2)
    print(text, file=sys.stderr)


def bench_host_io() -> None:
    """Host-only TIFF codec throughput — NO device in the loop.

    Mirrors the reference's native-I/O benchmarks (LsDeconvolveMultiGPU/
    README.md:31-43: load_bl_tif 2.5-5x vs imread, save_bl_tif 2-3x):
    native C++ encoder/decoder vs the pure-Python codec, 8 writer/reader
    threads (the pipeline writer-pool shape), 2048^2 u16 planes.
    """
    import tempfile
    from concurrent.futures import ThreadPoolExecutor
    from pathlib import Path

    from ipp_tpu import native
    from ipp_tpu.io import tiff as tio

    # This machine exposes ONE schedulable CPU (cgroup pin) — thread-pool
    # numbers here are SINGLE-CORE codec efficiency, not scaling; the
    # threaded architecture is exercised (8 workers) but cannot speed up.
    metrics["host_nproc"] = len(_os.sched_getaffinity(0))
    rng = np.random.default_rng(7)
    n_planes, hw = 32, 2048
    planes = [rng.integers(0, 40000, (hw, hw)).astype(np.uint16)
              for _ in range(n_planes)]
    mpix = n_planes * hw * hw / 1e6
    have_native = native.available()

    with tempfile.TemporaryDirectory() as td:
        d = Path(td)

        def timed(fn, args_list, warm=4):
            with ThreadPoolExecutor(max_workers=8) as pool:
                list(pool.map(lambda a: fn(*a), args_list[:warm]))
                t0 = time.time()
                list(pool.map(lambda a: fn(*a), args_list))
                return time.time() - t0

        # --- encode ---
        py_args = [(d / f"py{i}.tif", planes[i]) for i in range(n_planes)]
        enc_py = timed(tio.write_tiff, py_args)
        metrics["host_encode_python_mpix_s"] = round(mpix / enc_py, 1)
        if have_native:
            nat_args = [(d / f"nat{i}.tif", planes[i])
                        for i in range(n_planes)]
            enc_nat = timed(native.tiff_write, nat_args)
            metrics["host_encode_native_mpix_s"] = round(mpix / enc_nat, 1)
            metrics["host_encode_native_vs_python"] = round(enc_py / enc_nat,
                                                            2)
        # --- decode (single-plane path) ---
        dec_py = timed(tio.read_tiff, [(a[0],) for a in py_args])
        metrics["host_decode_python_mpix_s"] = round(mpix / dec_py, 1)
        if have_native:
            dec_nat = timed(native.tiff_read, [(a[0],) for a in py_args])
            metrics["host_decode_native_mpix_s"] = round(mpix / dec_nat, 1)
            metrics["host_decode_native_vs_python"] = round(dec_py / dec_nat,
                                                            2)
        try:
            from PIL import Image

            def pil_read(p):
                with Image.open(p) as im:
                    return np.asarray(im)

            dec_pil = timed(pil_read, [(a[0],) for a in py_args])
            metrics["host_decode_pil_mpix_s"] = round(mpix / dec_pil, 1)
        except Exception:  # noqa: BLE001
            pass
        # --- threaded ROI block read (the load_bl_tif role) ---
        if have_native:
            paths = [a[0] for a in py_args]
            native.read_block(paths, 0, hw, 0, hw)  # warm (page cache)
            t0 = time.time()
            blk = native.read_block(paths, 0, hw, 0, hw, nthreads=8)
            blk_s = time.time() - t0
            assert blk is not None and blk.shape == (n_planes, hw, hw)
            metrics["host_block_read_mpix_s"] = round(mpix / blk_s, 1)
        print(
            "host IO (no device, 8 threads, 32x2048^2 u16): "
            f"encode native {metrics.get('host_encode_native_mpix_s', 0):.0f}"
            f" vs python {metrics['host_encode_python_mpix_s']:.0f} Mpix/s "
            f"({metrics.get('host_encode_native_vs_python', 0):.1f}x); "
            f"decode native {metrics.get('host_decode_native_mpix_s', 0):.0f}"
            f" vs python {metrics['host_decode_python_mpix_s']:.0f}"
            f" vs PIL {metrics.get('host_decode_pil_mpix_s', 0):.0f} Mpix/s "
            f"({metrics.get('host_decode_native_vs_python', 0):.1f}x); "
            f"block read {metrics.get('host_block_read_mpix_s', 0):.0f} "
            "Mpix/s", file=sys.stderr)


def bench_brick_cache() -> None:
    """Host-only brick-cache throughput — NO device in the loop.

    Mirrors the reference's LZ4 block-cache benchmarks
    (LsDeconvolveMultiGPU/README.md:32-33,42: save_lz4 >50x vs MATLAB
    .mat save, load_lz4 >4x, load_slab_lz4 6-8x): our zstd brick cache
    (native/fastio.cpp) vs the honest Python counterpart
    (np.savez_compressed / np.load, the .mat-save analog), plus the
    threaded slab reassembly vs a Python loop of loads + copies.
    """
    import tempfile
    from pathlib import Path

    from ipp_tpu import native

    if not native.available():
        return
    rng = np.random.default_rng(11)
    # decon-brick-like content: smooth structure + noise, u16 (the decon
    # pipeline caches bricks as u16 with a per-block affine range)
    z = np.linspace(0, 6, 64, dtype=np.float32)
    base = (np.sin(z)[:, None, None]
            * np.cos(np.linspace(0, 9, 256, dtype=np.float32))[None, :, None]
            * np.sin(np.linspace(0, 7, 256, dtype=np.float32))[None, None, :])
    brick = ((base * 12000 + 20000)
             + rng.normal(0, 300, (64, 256, 256))).astype(np.uint16)
    mb = brick.nbytes / 1e6

    def best(fn, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return min(ts)

    with tempfile.TemporaryDirectory() as td:
        d = Path(td)
        save_nat = best(lambda: native.zstd_save(d / "b.zst", brick))
        save_py = best(lambda: np.savez_compressed(d / "b.npz", I=brick))
        metrics["brick_save_native_mb_s"] = round(mb / save_nat, 1)
        metrics["brick_save_python_mb_s"] = round(mb / save_py, 1)
        metrics["brick_save_native_vs_python"] = round(save_py / save_nat, 1)
        load_nat = best(lambda: native.zstd_load(
            d / "b.zst", brick.shape, brick.dtype))
        load_py = best(lambda: np.load(d / "b.npz")["I"][:])
        metrics["brick_load_native_mb_s"] = round(mb / load_nat, 1)
        metrics["brick_load_python_mb_s"] = round(mb / load_py, 1)
        metrics["brick_load_native_vs_python"] = round(load_py / load_nat, 1)

        # slab reassembly: 4x4 grid of bricks -> one (64, 1024, 1024) slab
        bricks = []
        for gy in range(4):
            for gx in range(4):
                p = d / f"s{gy}{gx}.zst"
                native.zstd_save(p, brick)
                bricks.append((str(p), gy * 256, gx * 256, 256, 256))
        slab_mb = 16 * mb

        def slab_native():
            out = native.load_slab(bricks, 64, 1024, 1024,
                                   dtype=np.uint16, nthreads=8)
            assert out is not None

        def slab_python():
            out = np.zeros((64, 1024, 1024), np.uint16)
            for p, y0, x0, by, bx in bricks:
                out[:, y0:y0 + by, x0:x0 + bx] = native.zstd_load(
                    p, (64, by, bx), np.uint16)

        t_nat = best(slab_native, reps=3)
        t_py = best(slab_python, reps=3)
        metrics["slab_native_mb_s"] = round(slab_mb / t_nat, 1)
        metrics["slab_serial_mb_s"] = round(slab_mb / t_py, 1)
        metrics["slab_native_vs_serial"] = round(t_py / t_nat, 1)
        # runtime pick (VERDICT r4 item 8): load_slab_auto calibrates on
        # first use; report the mode it lands on and its measured rate
        native._slab_choice["mode"] = None
        native.load_slab_auto(bricks, 64, 1024, 1024, dtype=np.uint16)
        metrics["slab_mode_chosen"] = native.slab_mode()
        metrics["slab_auto_mb_s"] = (
            metrics["slab_native_mb_s"]
            if metrics["slab_mode_chosen"] == "native"
            else metrics["slab_serial_mb_s"])
    print(
        "brick cache (host only, 64x256^2 u16 bricks): "
        f"save native {metrics['brick_save_native_mb_s']:.0f}"
        f" vs npz {metrics['brick_save_python_mb_s']:.0f} MB/s "
        f"({metrics['brick_save_native_vs_python']:.0f}x); "
        f"load native {metrics['brick_load_native_mb_s']:.0f}"
        f" vs npz {metrics['brick_load_python_mb_s']:.0f} MB/s "
        f"({metrics['brick_load_native_vs_python']:.0f}x); "
        f"slab 8-thr {metrics['slab_native_mb_s']:.0f}"
        f" vs serial {metrics['slab_serial_mb_s']:.0f} MB/s "
        f"({metrics['slab_native_vs_serial']:.1f}x; "
        f"auto mode {metrics.get('slab_mode_chosen')}; "
        f"nproc={metrics.get('host_nproc', '?')} — thread scaling is "
        "capped by the cgroup CPU pin)", file=sys.stderr)


def main() -> None:
    from ipp_tpu.utils.jaxconfig import enable_persistent_cache

    enable_persistent_cache()
    bench_host_io()
    bench_brick_cache()
    import jax
    import jax.numpy as jnp

    from ipp_tpu.ops.deconv import richardson_lucy
    from ipp_tpu.ops.destripe import filter_streaks
    from ipp_tpu.ops.psf import gaussian_psf

    rng = np.random.default_rng(0)

    # Watchdog: a SIGTERM-killed predecessor can wedge the TPU tunnel for
    # ~10+ minutes, during which jax.devices() (and the first dispatch)
    # block indefinitely.  Rather than hang the driver forever, abort
    # (without printing a bogus JSON line) if first contact doesn't
    # complete inside the deadline.
    import threading

    _ready = threading.Event()

    def _host_only_record(reason: str) -> None:
        """The device is unreachable: record the HOST metrics already
        measured (encode/decode/brick-cache run before device init) as
        an honest partial benchmark instead of losing the round's
        record.  value=0 + device_unreachable flags it clearly."""
        metrics["device_unreachable"] = reason
        print(json.dumps({
            "metric":
                "rl_decon_fft_prod_block_halo16_10iter_core_throughput_per_chip",
            "value": 0.0,
            "unit": "Mvox/s",
            "vs_baseline": 0.0,
            "extra": metrics,
        }), flush=True)

    def _watchdog():
        # 2026-08-19: a HEALTHY init took ~17 min once (remote side
        # re-establishing after a back-to-back process exit), so the
        # deadline sits well above that — a truly wedged tunnel just
        # takes longer to report host-only.
        deadline = float(_os.environ.get("IPP_TPU_BENCH_INIT_TIMEOUT",
                                         "2400"))
        if not _ready.wait(timeout=deadline):
            print(f"bench: no device contact within {deadline:.0f}s "
                  "(wedged TPU tunnel?) — emitting host-only record",
                  file=sys.stderr, flush=True)
            _host_only_record(f"no device contact in {deadline:.0f}s")
            _os._exit(0)  # the JSON record on stdout is valid

    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        dev = jax.devices()[0]
        # prove a round-trip completes, not just backend registration
        float(jnp.sum(jnp.ones((8, 128), jnp.float32)))
    except RuntimeError as exc:  # backend init failed fast (UNAVAILABLE)
        _ready.set()  # stop the watchdog double-reporting
        print(f"bench: device init failed ({exc}) — emitting host-only "
              "record", file=sys.stderr, flush=True)
        _host_only_record((str(exc).splitlines() or [''])[0][:200])
        return
    _ready.set()
    print(f"device: {dev}", file=sys.stderr)

    # --- tunnel/link bandwidth probe (host<->device transfer) -------------
    # Lets the e2e per-stage split below be sanity-checked against raw link
    # capability: bytes_moved / bandwidth should approximate the measured
    # upload/fetch spans.
    probe = np.empty((32, 1024, 1024), np.uint16)  # 64 MB
    probe[:] = 1
    # scalar round-trip time (dispatch+fetch of 4 bytes)
    ts = []
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(jnp.ones((1,), jnp.float32)))
        ts.append(time.time() - t0)
    rtt = min(ts)
    up, down = [], []
    for _ in range(3):
        t0 = time.time()
        dev_arr = jax.device_put(probe)
        float(jnp.sum(dev_arr[:1, :1, :1]))  # force the upload to complete
        up.append(time.time() - t0)
        t0 = time.time()
        _ = np.asarray(dev_arr)
        down.append(time.time() - t0)
    up_mb = probe.nbytes / 1e6 / max(1e-9, min(up) - rtt)
    down_mb = probe.nbytes / 1e6 / max(1e-9, min(down))
    metrics["link_rtt_ms"] = round(rtt * 1e3, 1)
    metrics["link_up_mb_s"] = round(up_mb, 1)
    metrics["link_down_mb_s"] = round(down_mb, 1)
    print(f"link: scalar RTT {rtt * 1e3:.0f} ms, upload {up_mb:.0f} MB/s, "
          f"fetch {down_mb:.0f} MB/s (64 MB probe)", file=sys.stderr)
    del dev_arr, probe

    # --- headline: RL decon, production block config -----------------------
    # The pipeline deconvolves lane-aligned overlap-save blocks (FFT work
    # shape == block shape, wraparound absorbed by a halo of real neighbor
    # data; see pipeline.deconvolve.autosplit).  Headline = CORE voxels per
    # second on the block autosplit PLANS for the reference's own benchmark
    # volume (835.7 Gvox, LsDeconvolveMultiGPU/README.md:61) — the same
    # accounting as the reference's whole-volume wall-clock numbers.
    from ipp_tpu.pipeline.deconvolve import autosplit

    psf = jnp.asarray(gaussian_psf((9, 9, 9), (2.0, 2.0, 2.0)))
    niter = 10
    _, plan_halo, prod_shape = autosplit((7912, 12778, 8266), (9, 9, 9))
    # 4x the 9^3 PSF half-extent = 16 today (core NRMSE 9e-5,
    # docs/STATUS.md); taken from the plan so a future cost-model
    # recalibration can't desync the core accounting
    halo = plan_halo

    def time_block(fft_shape, reps):
        """Best-of-3 pipelined windows: queue REPS dispatches, keep
        partial sums ON device, fetch once — the ~30 ms tunnel round-trip
        per fetch would otherwise dominate (production overlaps dispatch
        with IO the same way)."""
        vol = jnp.asarray(rng.random(fft_shape, dtype=np.float32) * 1000.0)

        def run_many():
            acc = jnp.float32(0)
            for _ in range(reps):
                acc = acc + jnp.sum(richardson_lucy(
                    vol, psf, niter=niter, stop_criterion=0.0,
                    fft_shape=fft_shape))
            return float(acc)

        t0 = time.time()
        run_many()
        warm_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            run_many()
            best = min(best, (time.time() - t0) / reps)
        core_vox = np.prod([s - 2 * h for s, h in zip(fft_shape, halo)])
        return best, core_vox / best / 1e6, warm_s

    best256, core256_mvox, warm_s = time_block((256, 256, 256), 15)
    metrics["decon_256blk_core_mvox_s"] = round(core256_mvox, 2)
    metrics["decon_fft_mvox_s"] = round(256 ** 3 / best256 / 1e6, 2)
    print(f"decon 256^3 block: warm {warm_s:.1f}s, best {best256:.3f}s/block "
          f"(224^3 core: {core256_mvox:.1f} Mvox/s)", file=sys.stderr)
    # --- extra: per-block early stop on a converging block ----------------
    # (VERDICT r4 item 4 evidence: stop_criterion now applies on every
    # path; a smooth block converges in a few iterations and the wall
    # drops accordingly — effective iterations ~= niter * wall ratio)
    from scipy.ndimage import gaussian_filter as _gf

    smooth = jnp.asarray(_gf(rng.random((256, 256, 256),
                                        dtype=np.float32), 8.0) * 1000.0)

    def time_stop(stop, reps=8):
        def run_many():
            acc = jnp.float32(0)
            for _ in range(reps):
                acc = acc + jnp.sum(richardson_lucy(
                    smooth, psf, niter=niter, stop_criterion=stop,
                    fft_shape=(256, 256, 256)))
            return float(acc)

        run_many()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            run_many()
            best = min(best, (time.time() - t0) / reps)
        return best

    t_full = time_stop(0.0)
    t_stop = time_stop(2.0)
    metrics["decon_earlystop_wall_ratio"] = round(t_stop / t_full, 3)
    metrics["decon_earlystop_eff_iters"] = round(niter * t_stop / t_full, 1)
    print(f"decon early stop (smooth 256^3, stop=2%): {t_stop:.3f}s vs "
          f"{t_full:.3f}s full ({metrics['decon_earlystop_eff_iters']} "
          f"effective iters of {niter})", file=sys.stderr)

    best, mvox_s, warm_s = time_block(prod_shape, 6)
    metrics["decon_prod_block"] = list(map(int, prod_shape))
    _note("decon_core_mvox_s", mvox_s,
          f"decon production block {prod_shape}: warm {warm_s:.1f}s, "
          f"best {best:.3f}s/block (core: {mvox_s:.1f} Mvox/s, "
          f"{np.prod(prod_shape) / best / 1e6:.1f} Mvox/s fft-volume)")

    # --- secondary: destripe throughput -----------------------------------
    tiles = jnp.asarray(rng.integers(0, 40000, (16, 1024, 1024))
                        .astype(np.uint16))

    def run_destripe_many(reps=20):
        acc = jnp.uint32(0)
        for _ in range(reps):
            acc = acc + jnp.sum(filter_streaks(
                tiles, sigma=(128, 128), wavelet="db9").astype(jnp.uint32))
        return int(acc)

    t0 = time.time()
    run_destripe_many(1)
    destripe_compile = time.time() - t0
    run_destripe_many()
    # best-of-3 windows: tunnel-RTT hiccups measured a 1.6x swing on
    # single-window runs (1096 vs 1806 Mpix/s session-to-session)
    destripe_s = float("inf")
    for _ in range(3):
        t0 = time.time()
        run_destripe_many()
        destripe_s = min(destripe_s, (time.time() - t0) / 20)
    destripe_mpix = tiles.size / destripe_s / 1e6
    _note("destripe_mpix_s", destripe_mpix,
          f"destripe: compile {destripe_compile:.1f}s, steady "
          f"{destripe_s:.3f}s ({destripe_mpix:.1f} Mpix/s)")

    # --- secondary: lightsheet correction (Mpix/s) -------------------------
    from ipp_tpu.ops.lightsheet import correct_lightsheet

    # single-plane (the per-plane merge post-processing call pattern).
    # u16 input = the production dtype: grid_percentile keeps integer
    # samples native through the counting passes (half the HBM traffic
    # of the f32 path; measured 357 -> 512 Mpix/s single-plane)
    ls_img = jnp.asarray(rng.integers(0, 40000, (2048, 2048))
                         .astype(np.uint16))

    def run_ls(reps=20):
        acc = jnp.float32(0)
        for _ in range(reps):
            acc = acc + jnp.sum(correct_lightsheet(ls_img))
        return float(acc)

    run_ls(1)
    run_ls()
    ls_s = float("inf")
    for _ in range(3):
        t0 = time.time()
        run_ls()
        ls_s = min(ls_s, (time.time() - t0) / 20)
    _note("lightsheet_mpix_s", ls_img.size / ls_s / 1e6,
          f"lightsheet correction: {ls_img.size / ls_s / 1e6:.0f} Mpix/s "
          f"(single 2048^2 plane)")

    # batched planes (4 per dispatch — the merge loop's batch form)
    ls_batch = jnp.asarray(rng.integers(0, 40000, (4, 2048, 2048))
                           .astype(np.uint16))

    def run_lsb(reps=10):
        acc = jnp.float32(0)
        for _ in range(reps):
            acc = acc + jnp.sum(correct_lightsheet(ls_batch))
        return float(acc)

    run_lsb(1)
    run_lsb()
    lsb_s = float("inf")
    for _ in range(3):
        t0 = time.time()
        run_lsb()
        lsb_s = min(lsb_s, (time.time() - t0) / 10)
    _note("lightsheet_batch4_mpix_s", ls_batch.size / lsb_s / 1e6,
          f"lightsheet correction: {ls_batch.size / lsb_s / 1e6:.0f} Mpix/s "
          f"(4-plane batch)")

    # --- secondary: NCC alignment maps (pairs/s) ---------------------------
    from ipp_tpu.ops.ncc import ncc_maps_batched

    B = 32
    m1 = jnp.asarray(rng.random((B, 512, 128), dtype=np.float32))
    m2 = jnp.asarray(rng.random((B, 512, 128), dtype=np.float32))

    def run_ncc(reps=20):
        acc = jnp.float32(0)
        for _ in range(reps):
            acc = acc + jnp.sum(ncc_maps_batched(m1, m2, 30, 30))
        return float(acc)

    run_ncc()
    # best-of-3 timed windows: a single tunnel-RTT hiccup inside one
    # 20-rep window measured a 2x pair-rate swing session-to-session
    ncc_s = float("inf")
    for _ in range(3):
        t0 = time.time()
        run_ncc()
        ncc_s = min(ncc_s, (time.time() - t0) / 20)
    _note("ncc_pairs_s", B / ncc_s,
          f"ncc: {B} MIP pairs in {ncc_s:.3f}s ({B / ncc_s:.0f} pairs/s)")

    # --- secondary: merge blend (Mpix/s) -----------------------------------
    # The production inner op of stitch/blend.blend_planes: one batched
    # tile-accumulate dispatch over a plane batch.  Chained dispatches keep
    # the data dependency honest (a fori_loop formulation measured 8 ms/iter
    # of per-iteration backend overhead on the axon tunnel — 4x the same op
    # dispatched from the host queue — and the pre-r3 unchained loop was
    # DCE-inflated to 7.5 Gpix/s).
    BB = 8
    tile_a = jnp.asarray(rng.random((BB, 2048, 2048), dtype=np.float32))
    tile_b = jnp.asarray(rng.random((BB, 2048, 2048), dtype=np.float32))
    wa = jnp.asarray(rng.random((BB, 2048, 2048), dtype=np.float32))

    BREPS = 10

    @jax.jit
    def blend_acc(img, acc, w):
        return jnp.clip(img * w + acc * (1.0 - w), 0, 65535.0)

    def run_blend():
        acc = tile_b
        for _ in range(BREPS):
            acc = blend_acc(tile_a, acc, wa)
        return float(jnp.sum(acc[:1, :1, :1]))

    run_blend()
    blend_s = None
    for _ in range(3):  # best-of-3 windows (tunnel hiccups: 2x swings)
        t0 = time.time()
        run_blend()
        dt = (time.time() - t0) / BREPS
        blend_s = dt if blend_s is None else min(blend_s, dt)
    _note("merge_blend_mpix_s", tile_a.size / blend_s / 1e6,
          f"merge blend: {tile_a.size / blend_s / 1e6:.0f} Mpix/s "
          f"({BB}-plane batched accumulate)")

    # --- preprocess stage WITH IO (read -> destripe -> write) --------------
    import tempfile
    from pathlib import Path

    from ipp_tpu.io import tiff as tio
    from ipp_tpu.ops.process import ProcessConfig
    from ipp_tpu.pipeline.pystripe_cli import batch_filter

    with tempfile.TemporaryDirectory() as td:
        src = Path(td) / "src"
        src.mkdir()
        n_tiles = 24
        for i in range(n_tiles):
            tio.imwrite(src / f"t{i:03d}.tif",
                        rng.integers(0, 40000, (1024, 1024))
                        .astype(np.uint16))
        cfg = ProcessConfig(sigma=(128, 128), wavelet="db9", dark=100.0)
        # warm the executable on this shape, then time fresh passes —
        # best-of-3 windows like destripe/NCC (tunnel hiccups measured a
        # 2x swing on this stage: 2.8-5.8s for identical code)
        batch_filter(src, Path(td) / "warm", cfg, batch_size=8)
        from ipp_tpu.utils import iostat as _iostat

        pre_s, pre_st = None, {}
        for rep in range(3):
            _iostat.enable()
            t0 = time.time()
            batch_filter(src, Path(td) / f"out{rep}", cfg, batch_size=8)
            dt = time.time() - t0
            st = _iostat.disable()
            if pre_s is None or dt < pre_s:
                pre_s, pre_st = dt, st
        pre_mpix = n_tiles * 1024 * 1024 / pre_s / 1e6
        metrics["preprocess_device_s"] = round(
            pre_st.get("device_process_s", 0.0), 2)
        metrics["preprocess_host_decode_s"] = round(
            pre_st.get("host_decode_s", 0.0), 2)
        metrics["preprocess_host_encode_s"] = round(
            pre_st.get("host_encode_s", 0.0), 2)
        _note("preprocess_io_mpix_s", pre_mpix,
              f"preprocess (read+destripe+write, {n_tiles}x1024^2): "
              f"{pre_s:.1f}s ({pre_mpix:.0f} Mpix/s incl. IO; device "
              f"{pre_st.get('device_process_s', 0.0):.1f}s, host decode "
              f"{pre_st.get('host_decode_s', 0.0):.1f}s(thr), encode "
              f"{pre_st.get('host_encode_s', 0.0):.1f}s(thr))")

    # --- e2e stitch: steady-state, per-stage splits ------------------------
    from ipp_tpu.geometry.stacks import TileGrid
    from ipp_tpu.stitch.align import compute_displacements
    from ipp_tpu.stitch.merge import merge_to_tif_series
    from ipp_tpu.stitch.place import (place_tiles_mst, project_displacements,
                                      threshold_displacements)

    overlap = 64
    nz, tile_hw, n_rc = 48, 512, 5
    full = tile_hw * n_rc - overlap * (n_rc - 1)
    # cheap structured texture (multi-scale sinusoid mixture + impulses):
    # enough overlap correlation for NCC without a minutes-long
    # gaussian_filter over the full volume
    zz = np.arange(nz, dtype=np.float32)[:, None, None]
    yy = np.arange(full + 16, dtype=np.float32)[None, :, None]
    xx = np.arange(full + 16, dtype=np.float32)[None, None, :]
    vol = (np.sin(yy / 17.3 + zz / 3.1) * np.cos(xx / 23.7 - zz / 5.9)
           + 0.6 * np.sin(yy / 5.1) * np.sin(xx / 7.7)
           + 0.3 * np.sin((yy + xx) / 41.0 + zz / 2.3))
    vol = ((vol - vol.min()) / (vol.max() - vol.min()) * 8000).astype(
        np.float32)
    vol += rng.normal(0, 60, vol.shape).astype(np.float32)
    vol = np.clip(vol, 0, 65535)
    with tempfile.TemporaryDirectory() as td:
        root = Path(td) / "ch"
        rng2 = np.random.default_rng(1)
        for r in range(n_rc):
            for c in range(n_rc):
                # dir names carry the NOMINAL stage grid; the cut position
                # is jittered — alignment has to recover it
                yn = r * (tile_hw - overlap)
                xn = c * (tile_hw - overlap)
                y0 = yn + int(rng2.integers(0, 7))
                x0 = xn + int(rng2.integers(0, 7))
                d = (root / f"{xn * 10:06d}" /
                     f"{xn * 10:06d}_{yn * 10:06d}")
                d.mkdir(parents=True)
                for z in range(nz):
                    tio.imwrite(d / f"{z:06d}.tif",
                                vol[z, y0:y0 + tile_hw, x0:x0 + tile_hw]
                                .astype(np.uint16))
        from ipp_tpu.utils import iostat

        # cold pass first: on the axon tunnel the remote compile-cache
        # residency varies run to run (measured 2.1-11.1 pairs/s for the
        # IDENTICAL program set), so the reported metric is the warm
        # second pass (steady-state, like every kernel stage); the cold
        # wall rides in extras.
        t0 = time.time()
        grid = TileGrid.from_directory(root)
        cands = compute_displacements(
            grid, overlap_v=overlap, overlap_h=overlap,
            displ_max_v=12, displ_max_h=12, displ_max_d=3, subvol_dim=24)
        metrics["e2e_align_cold_s"] = round(time.time() - t0, 1)
        iostat.enable()
        t0 = time.time()
        cands = compute_displacements(
            grid, overlap_v=overlap, overlap_h=overlap,
            displ_max_v=12, displ_max_h=12, displ_max_d=3, subvol_dim=24)
        align_s = time.time() - t0
        align_st = iostat.disable()
        t0 = time.time()
        project_displacements(grid, cands, overlap, overlap)
        threshold_displacements(grid, reliability_threshold=0.6)
        place_tiles_mst(grid)
        place_s = time.time() - t0
        iostat.enable()
        t0 = time.time()
        out_dir, _ = merge_to_tif_series(grid, Path(td) / "stitched",
                                         plane_batch=4)
        merge_s = time.time() - t0
        merge_st = iostat.disable()
        e2e_s = align_s + place_s + merge_s
        n_vox = nz * full * full
        n_pairs = 2 * n_rc * (n_rc - 1) * 2  # pairs x z-chunks
        _note("e2e_align_pairs_s", n_pairs / align_s,
              f"e2e align: {n_pairs} pair-chunks in {align_s:.1f}s "
              f"({n_pairs / align_s:.1f} pairs/s incl. IO)")
        _note("e2e_merge_to_disk_mpix_s", n_vox / merge_s / 1e6,
              f"e2e merge-to-disk: {n_vox / 1e6:.0f} Mpix in {merge_s:.1f}s "
              f"({n_vox / merge_s / 1e6:.1f} Mpix/s incl. TIFF writes)")
        _note("e2e_stitch_mvox_s", n_vox / e2e_s / 1e6,
              f"e2e stitch ({n_rc}x{n_rc} x {nz}z x {tile_hw}^2, "
              f"align+place+merge): {e2e_s:.1f}s "
              f"({n_vox / e2e_s / 1e6:.1f} Mvox/s incl. IO; persistent "
              f"compile cache keeps repeat runs steady-state)")

        # per-stage decomposition measured INSIDE the production code paths
        # (ipp_tpu.utils.iostat spans; host decode/encode are THREAD-seconds
        # summed across the reader/writer pools, device spans are wall)
        def split(tag, wall, st, extra_keys=()):
            parts = {
                "wall_s": round(wall, 2),
                "host_decode_s": round(st.get("host_decode_s", 0.0), 2),
                "host_encode_s": round(st.get("host_encode_s", 0.0), 2),
                "device_upload_s": round(st.get("device_upload_s", 0.0), 2),
                "device_dispatch_s": round(st.get("device_dispatch_s", 0.0),
                                           2),
                "device_fetch_s": round(st.get("device_fetch_s", 0.0), 2),
            }
            for k in extra_keys:
                parts[k] = round(st.get(k, 0.0), 2)
            for k, v in parts.items():
                metrics[f"{tag}_{k}"] = v
            device_s = (parts["device_upload_s"] + parts["device_dispatch_s"]
                        + parts["device_fetch_s"]
                        + parts.get("device_ncc_s", 0.0))
            other = wall - device_s - max(parts["host_decode_s"],
                                          parts["host_encode_s"])
            print(f"  {tag} split: wall {wall:.1f}s = host-decode "
                  f"{parts['host_decode_s']:.1f}s(thr) + host-encode "
                  f"{parts['host_encode_s']:.1f}s(thr) + device "
                  f"{device_s:.1f}s (up {parts['device_upload_s']:.1f} / "
                  f"dispatch {parts['device_dispatch_s']:.1f} / fetch "
                  f"{parts['device_fetch_s']:.1f}"
                  + (f" / ncc {parts['device_ncc_s']:.1f}"
                     if "device_ncc_s" in parts else "")
                  + f") + host-other ~{max(0.0, other):.1f}s",
                  file=sys.stderr)

        split("e2e_align", align_s, align_st, extra_keys=("device_ncc_s",))
        split("e2e_merge", merge_s, merge_st)
        # link-bound sanity projection: bytes the merge moved across the
        # link vs the measured link bandwidth.  device_put is async, so
        # upload time is paid inside the fetch wait — the device total
        # should approximate (upload+fetch bytes)/link_bw on the tunnel,
        # and collapses to ~0 with a locally-attached TPU.
        moved = (merge_st.get("device_upload_bytes", 0)
                 + merge_st.get("device_fetch_bytes", 0))
        proj = moved / 1e6 / max(1e-9, min(up_mb, down_mb))
        metrics["e2e_merge_link_bytes_mb"] = round(moved / 1e6, 1)
        metrics["e2e_merge_link_projected_s"] = round(proj, 1)
        print(f"  merge moved {moved / 1e6:.0f} MB across the link; "
              f"projected {proj:.1f}s at the measured {min(up_mb, down_mb):.0f} "
              "MB/s — the e2e-vs-kernel gap is link transfer, not compute",
              file=sys.stderr)

    baseline_mvox_s = 27.6  # per-GPU FFT decon on 8x A100 (BASELINE.md)
    print(json.dumps({
        "metric": "rl_decon_fft_prod_block_halo16_10iter_core_throughput_per_chip",
        "value": round(mvox_s, 2),
        "unit": "Mvox/s",
        "vs_baseline": round(mvox_s / baseline_mvox_s, 3),
        "extra": metrics,
    }))


if __name__ == "__main__":
    main()
