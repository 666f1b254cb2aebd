"""Golden cross-validation of the isotropic-downsample planning math
against the reference's OWN parallel_image_processor.py run verbatim.

The downsample plan decides the npz the atlas-registration step consumes
(target shape, alternating max/mean method ladder, voxel-coordinate axes) —
pin it by executing the reference's calculate_down_sampling_target
(parallel_image_processor.py:156-189) and generate_voxel_spacing (:459-474),
not re-derived expectations.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

from tests.refshims import (REF, install_process_images_shims, install_shims,
                            load_pystripe_core)

pytestmark = pytest.mark.skipif(
    not (REF / "parallel_image_processor.py").exists(),
    reason="reference parallel_image_processor unavailable")


def _exact_resize_local_mean(x, out_shape):
    """skimage.transform.resize_local_mean stand-in, exact for integer
    decimation factors (the only configurations the goldens use): plain
    block mean."""
    (n_out,) = out_shape
    n_in = x.shape[0]
    assert n_in % n_out == 0, "goldens must use integer factors"
    return x.reshape(n_out, n_in // n_out).mean(axis=1)


@pytest.fixture(scope="module")
def ref_pip():
    install_shims()
    load_pystripe_core()  # parallel_image_processor imports pystripe.core
    install_process_images_shims()
    import skimage.transform as sk_transform

    sk_transform.resize_local_mean = _exact_resize_local_mean
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import parallel_image_processor as pip  # noqa: PLC0415

    # the reference binds resize_local_mean at ITS import time with
    # `from skimage.transform import ...`; other golden suites may have
    # imported it earlier (process_images imports it) with the
    # placeholder still installed — rebind on the module namespace
    pip.resize_local_mean = _exact_resize_local_mean
    return pip


def _ref_plan(ref_pip, shape_yx, source_voxel_zyx, target_voxel,
              rotation=0, alternating=True):
    """Drive the reference's plan method on a bare instance (the method
    only touches the attributes set here)."""
    mp = ref_pip.MultiProcess.__new__(ref_pip.MultiProcess)
    mp.shape = tuple(shape_yx)
    mp.source_voxel = tuple(source_voxel_zyx)
    mp.target_voxel = float(target_voxel)
    if rotation in (90, 270):
        mp.calculate_down_sampling_target(
            (shape_yx[1], shape_yx[0]), True, alternating)
    else:
        mp.calculate_down_sampling_target(tuple(shape_yx), False, alternating)
    names = {np.max: "max", np.mean: "mean", None: None}
    methods = [(names[my], names[mx]) for my, mx in mp.down_sampling_methods]
    return mp.target_shape, methods


CASES = [
    # (plane shape, voxel zyx um, target um)
    ((2048, 1024), (2.0, 0.4, 0.4), 16.0),
    ((1000, 1000), (1.0, 1.0, 1.0), 10.0),
    ((4096, 2048), (4.0, 0.8, 0.4), 25.0),  # anisotropic xy: padded ladder
    ((512, 512), (1.0, 2.0, 2.0), 3.0),     # barely any reduction
]


@pytest.mark.parametrize("shape,voxel,target", CASES)
def test_downsample_plan_matches_reference(ref_pip, shape, voxel, target):
    from ipp_tpu.ops.resample import plan_isotropic_downsampling

    ref_shape, ref_methods = _ref_plan(ref_pip, shape, voxel, target)
    our_shape, our_methods = plan_isotropic_downsampling(
        shape, (voxel[1], voxel[2]), target)
    assert tuple(our_shape) == tuple(ref_shape)
    assert our_methods == ref_methods


def test_downsample_plan_non_alternating(ref_pip):
    """alternating=False turns every rung into (mean, mean)."""
    ref_shape, ref_methods = _ref_plan(
        ref_pip, (2048, 1024), (2.0, 0.4, 0.4), 16.0, alternating=False)
    assert all(m == ("mean", "mean") for m in ref_methods)
    from ipp_tpu.ops.resample import plan_isotropic_downsampling

    _, our_methods = plan_isotropic_downsampling(
        (2048, 1024), (0.4, 0.4), 16.0)
    assert len(our_methods) == len(ref_methods)


def test_voxel_spacing_axes_match_reference(ref_pip):
    """generate_voxel_spacing vs downsampled_npz's closed-form axes: the
    reference centers source voxel locations at 0, local-mean-resizes to
    the target length, rounds the start, and steps by target_voxel."""
    shape = (64, 256, 128)
    source_voxel = (4.0, 1.0, 2.0)
    target_voxel = 16.0
    target_shape = (16, 16, 16)  # integer factors: 4, 16, 8
    ref_axes = ref_pip.generate_voxel_spacing(
        shape, source_voxel, target_shape, target_voxel)
    for n_full, vox, n_target, ref in zip(shape, source_voxel, target_shape,
                                          ref_axes):
        block = n_full / n_target
        start = round((block - n_full) / 2.0 * vox)
        ours = start + target_voxel * np.arange(n_target)
        np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_downsample_application_matches_reference(ref_pip):
    """The APPLICATION of the plan, not just the plan: the reference runs
    per-AXIS block reductions — (2,1) with method_y then (1,2) with
    method_x, each guarded by ceil(dim/2) >= target — inside its worker
    loop (parallel_image_processor.py:376-384), then the z ladder
    (:412-419).  Transcribed here with skimage/np ops and pinned against
    ops.resample.isotropic_downsample_plane + merge._z_reduce."""
    import skimage.measure as sk_measure

    from ipp_tpu.ops.resample import isotropic_downsample_plane
    from ipp_tpu.stitch.merge import _z_reduce

    rng = np.random.default_rng(3)
    # anisotropic voxel + non-pow4 reduction: the y/x ladders differ in
    # length AND the per-axis guards trigger on x before y
    shape_yx, voxel_zyx, target = (300, 220), (2.0, 0.8, 0.4), 10.0
    ref_shape, _ = _ref_plan(ref_pip, shape_yx, voxel_zyx, target)
    from ipp_tpu.ops.resample import plan_isotropic_downsampling

    our_shape, methods = plan_isotropic_downsampling(
        shape_yx, voxel_zyx[1:], target)
    assert tuple(our_shape) == tuple(ref_shape)
    np_methods = [(np.max if m == "max" else np.mean if m == "mean" else None)
                  for pair in methods for m in pair]
    np_methods = list(zip(np_methods[0::2], np_methods[1::2]))

    planes = [rng.random(shape_yx).astype(np.float32) * 5000
              for _ in range(9)]
    ref_small, our_small = [], []
    for img in planes:
        ref = img.astype(np.float32)
        for ym, xm in np_methods:   # the reference loop, transcribed
            if ym is not None and np.ceil(ref.shape[0] / 2) >= ref_shape[0]:
                ref = sk_measure.block_reduce(ref, (2, 1), ym)
            if xm is not None and np.ceil(ref.shape[1] / 2) >= ref_shape[1]:
                ref = sk_measure.block_reduce(ref, (1, 2), xm)
        ref_small.append(ref)
        ours = np.asarray(isotropic_downsample_plane(
            img, ref_shape, methods, resize_final=False))
        our_small.append(ours)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    # z ladder: ceil(sqrt(r_z)) methods, shape>1 guard (:250-252, 412-419)
    n_z = int(np.ceil(np.sqrt(target / voxel_zyx[0])))
    method_z = tuple(np.max if i % 2 == 0 else np.mean for i in range(n_z))
    z_ref = np.stack(ref_small)
    for zm in method_z:             # the reference tail, transcribed
        if zm is not None and z_ref.shape[0] > 1:
            z_ref = sk_measure.block_reduce(z_ref, (2, 1, 1), zm)
    z_ours = _z_reduce(np.stack(our_small), n_z)
    np.testing.assert_allclose(z_ours, z_ref, rtol=1e-5)


def test_downsample_plan_golden_fuzz(ref_pip):
    """Seeded fuzz of the ladder planner across shapes / voxel
    anisotropies / targets (parallel_image_processor.py:156-189),
    alternating and non-alternating, plus the 90/270 swapped-shape path."""
    from ipp_tpu.ops.resample import plan_isotropic_downsampling

    r = np.random.default_rng(20260819)
    for _ in range(24):
        shape = (int(r.integers(256, 4097)), int(r.integers(256, 4097)))
        vy = float(r.choice([0.4, 0.8, 1.0, 1.8, 2.0]))
        vx = float(r.choice([0.4, 0.8, 1.0, 1.8, 2.0]))
        vz = float(r.choice([1.0, 2.0, 4.0]))
        target = float(r.choice([3.0, 10.0, 16.0, 25.0, 50.0]))
        rotation = int(r.choice([0, 90]))
        ref_shape, ref_methods = _ref_plan(
            ref_pip, shape, (vz, vy, vx), target, rotation=rotation)
        # a 90/270 rotation swaps both the plane shape AND the in-plane
        # voxel (the reference swaps source_voxel internally,
        # parallel_image_processor.py:166-170; our converter does the
        # same at pipeline/convert.py)
        if rotation in (90, 270):
            plan_shape, plan_voxel = (shape[1], shape[0]), (vx, vy)
        else:
            plan_shape, plan_voxel = shape, (vy, vx)
        our_shape, our_methods = plan_isotropic_downsampling(
            plan_shape, plan_voxel, target)
        assert tuple(our_shape) == tuple(ref_shape), (
            shape, (vz, vy, vx), target, rotation)
        assert our_methods == ref_methods, (
            shape, (vz, vy, vx), target, rotation)
