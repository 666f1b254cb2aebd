"""Golden cross-validation of the full per-tile preprocessing COMPOSITION
against the reference's OWN pystripe process_img run verbatim.

filter_streaks and the intensity conversions each have their own golden
suites; what is pinned here is the ORDER and wiring of process_img
(pystripe/core.py:1190-1383): flat -> downsample -> destripe -> dark ->
8/16-bit conversion -> flip_upside_down -> rotate, plus the uniform-tile
zeros short-circuit including its size/dtype bookkeeping.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.refshims import (REF, _shim_block_reduce,
                            install_process_images_shims, install_shims,
                            load_pystripe_core)
from tests.test_golden_destripe import _interior, _nrmse, make_striped_tile

from ipp_tpu.ops.process import ProcessConfig, process_img

pytestmark = pytest.mark.skipif(
    not (REF / "pystripe" / "core.py").exists(),
    reason="reference pystripe unavailable")


def _run_ours(img: np.ndarray, cfg: ProcessConfig) -> np.ndarray:
    return np.asarray(process_img(img[None].copy(), cfg))[0]


@pytest.fixture(scope="module")
def ref_core():
    install_shims()
    install_process_images_shims()
    core = load_pystripe_core()
    # core may have been imported by an earlier golden while
    # skimage.measure.block_reduce was still a raising placeholder; its
    # from-import binding is per-module, so install the functional shim
    # directly (same registry object install_process_images_shims uses)
    core.block_reduce = _shim_block_reduce
    return core


def test_process_img_destripe_dark_8bit_flip_rotate(ref_core, rng):
    """Destripe -> dark -> 8-bit bit-shift -> flipud -> rot90 composition
    (pystripe/core.py:1302-1381: dark AFTER filter_streaks, conversion
    after that, flip BEFORE rotate)."""
    core = ref_core
    img, _ = make_striped_tile(rng, h=256, w=256, stripe_strength=0.3)
    kw = dict(sigma=(48, 48), level=2, wavelet="db4",
              padding_mode="reflect")
    ref = core.process_img(img.copy(), dark=120.0, convert_to_8bit=True,
                           bit_shift_to_right=3, flip_upside_down=True,
                           rotate=90, **kw)
    cfg = ProcessConfig(sigma=(48, 48), level=2, wavelet="db4",
                        padding_mode="reflect", dark=120.0,
                        convert_to_8bit=True, bit_shift_to_right=3,
                        flip_upside_down=True, rotate=90)
    ours = _run_ours(img, cfg)
    assert ref.dtype == ours.dtype == np.uint8
    assert ref.shape == ours.shape == (256, 256)
    # undo flip+rotate to compare interiors away from pad-boundary effects
    ref_core = _interior(np.flipud(np.rot90(ref, -1)), 40)
    our_core = _interior(np.flipud(np.rot90(ours, -1)), 40)
    err = _nrmse(our_core, ref_core)
    assert err < 8e-3, f"interior NRMSE {err:.2e}"
    # and the flip/rotate order itself must match exactly: the two
    # transformed frames agree wherever the cores agree
    assert np.mean(np.abs(ref.astype(int) - ours.astype(int)) <= 2) > 0.97


def test_process_img_downsample_then_destripe(ref_core, rng):
    """down_sample runs BEFORE filter_streaks (pystripe/core.py:1289-1302)
    so the destriping sees the reduced tile; 16-bit clip tail."""
    core = ref_core
    img, _ = make_striped_tile(rng, h=256, w=256, stripe_strength=0.3)
    kw = dict(sigma=(32, 32), level=2, wavelet="db4",
              padding_mode="reflect")
    ref = core.process_img(img.copy().astype(np.float64),
                           down_sample=(2, 2),
                           down_sample_method="max", **kw)
    cfg = ProcessConfig(sigma=(32, 32), level=2, wavelet="db4",
                        padding_mode="reflect", down_sample=(2, 2),
                        down_sample_method="max")
    ours = _run_ours(img.astype(np.float32), cfg)
    assert ref.shape == ours.shape == (128, 128)
    err = _nrmse(_interior(ours, 20), _interior(ref, 20))
    assert err < 8e-3, f"interior NRMSE {err:.2e}"


def test_process_img_uniform_tile_short_circuit(ref_core):
    """A uniform tile becomes zeros at the OUTPUT geometry/dtype:
    downsampled size, rotation transpose, conversion dtype
    (pystripe/core.py:1232-1246)."""
    core = ref_core
    img = np.full((64, 96), 500, np.uint16)
    ref = core.process_img(img.copy(), down_sample=(2, 2),
                           down_sample_method="max", convert_to_8bit=True,
                           rotate=90)
    cfg = ProcessConfig(down_sample=(2, 2), down_sample_method="max",
                        convert_to_8bit=True, rotate=90)
    ours = _run_ours(img, cfg)
    assert ref.shape == ours.shape == (48, 32)
    assert ref.dtype == ours.dtype == np.uint8
    assert not ref.any() and not ours.any()


# ---------------------------------------------------------------------------
# seeded config fuzz over the process_img composition surface
# (pystripe/core.py:1190-1383): random combinations of destripe config,
# dark subtraction, downsample, 8/16-bit conversion, flip and rotate —
# reference run verbatim each time
# ---------------------------------------------------------------------------


def _proc_fuzz_configs(n=8, seed=20260819):
    r = np.random.default_rng(seed)
    cfgs = []
    for _ in range(n):
        s1 = int(r.integers(24, 97))
        cfgs.append(dict(
            sigma=(s1, s1 if r.random() < 0.6 else int(r.integers(24, 97))),
            level=int(r.integers(1, 4)),
            wavelet=str(r.choice(["db3", "db4", "db5", "db9", "sym4"])),
            dark=float(r.choice([0.0, 80.0, 120.0])),
            down_sample=(None if r.random() < 0.6
                         else (int(r.integers(2, 4)),) * 2),
            down_sample_method=str(r.choice(["max", "mean"])),
            convert_to_8bit=bool(r.random() < 0.4),
            bit_shift_to_right=int(r.integers(0, 9)),
            flip_upside_down=bool(r.random() < 0.4),
            rotate=int(r.choice([0, 90, 180, 270])),
        ))
    return cfgs


@pytest.mark.parametrize("kw", _proc_fuzz_configs())
def test_process_img_golden_fuzz(ref_core, rng, kw):
    core = ref_core
    img, _ = make_striped_tile(rng, h=256, w=288, stripe_strength=0.3)
    ref = core.process_img(img.copy(), padding_mode="reflect", **kw)
    cfg = ProcessConfig(padding_mode="reflect", **kw)
    ours = _run_ours(img, cfg)
    assert ref.dtype == ours.dtype and ref.shape == ours.shape, (
        (ref.dtype, ours.dtype, ref.shape, ours.shape, kw))
    # undo the geometric ops so the interior comparison excludes the
    # destripe pad boundary, then compare cores
    def undo(a):
        a = np.rot90(a, -kw["rotate"] // 90)
        return np.flipud(a) if kw["flip_upside_down"] else a
    margin = 40 if kw["down_sample"] is None else 20
    err = _nrmse(_interior(undo(ours), margin), _interior(undo(ref), margin))
    assert err < 8e-3, f"interior NRMSE {err:.2e} @ {kw}"
