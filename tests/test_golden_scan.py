"""Golden cross-validation of the dragonfly scanner against the
reference's own tsv/scan.py, run VERBATIM from /root/reference.

The reference module imports cleanly under the shared shim registry
(tifffile -> ipp_tpu.io.tiff, tqdm stub); its multiprocessing pool is
replaced by a serial stand-in so align_one_x/y/z run in-process.  Both
scanners walk the SAME synthetic dragonfly hierarchy (tests/synth.
write_dragonfly_tree) with known injected jitter, so three things are
pinned:

1. the hierarchy walk (stack keys, nominal positions, plane grouping —
   reference Scanner.__init__ tsv/scan.py:221-268 vs
   pipeline/scan_stitch.discover_scan_stacks);
2. every pairwise alignment vs truth, with the reference's offset sign
   conventions mapped explicitly (empirically confirmed: align_one_x
   reports (dx, -dy, dz), align_one_y (-dx, dy, dz), align_one_z
   (-dx, -dy, dz - len(s0)) relative to s1-s0 stack offsets);
3. agreement between the two engines wherever the truth is observable
   (z offsets beyond the last source plane have no overlapping content
   and both engines clamp — those pairs are excluded).
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

from ipp_tpu.pipeline.scan_stitch import discover_scan_stacks
from ipp_tpu.stitch.scan import Scanner as OurScanner
from tests.refshims import REF, install_shims
from tests.synth import write_dragonfly_tree

pytestmark = pytest.mark.skipif(not (REF / "tsv" / "scan.py").exists(),
                                reason="reference tsv unavailable")

SUB_PLANES = 16
Z_STEP = 12
Z_SLOP = 6


class _SerialFuture:
    def __init__(self, fn, args):
        self._result = fn(*args)

    def get(self):
        return self._result


class _SerialPool:
    def __init__(self, _n):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *_a):
        return False

    def apply_async(self, fn, args):
        return _SerialFuture(fn, args)


def _load_reference_scan():
    install_shims()
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import tsv.scan as rscan

    rscan.multiprocessing = types.SimpleNamespace(Pool=_SerialPool)
    return rscan


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("dragonfly") / "tree"
    rng = np.random.default_rng(5)
    truth, _vol = write_dragonfly_tree(root, rng, n_y=2)
    return root, truth


def _adjacent_pairs(keys):
    for k0 in sorted(keys):
        for axis, dk in enumerate(((1, 0, 0), (0, 1, 0), (0, 0, 1))):
            k1 = tuple(a + b for a, b in zip(k0, dk))
            if k1 in keys:
                yield axis, k0, k1


def test_hierarchy_walk_matches_reference(tree):
    root, truth = tree
    rscan = _load_reference_scan()
    ref = rscan.Scanner(Path(root), voxel_size=(1, 1, 1),
                        z_stepper_distance=Z_STEP, piezo_distance=SUB_PLANES,
                        z_skip=2, x_slop=5, y_slop=5, z_slop=Z_SLOP,
                        dark=100, decimate=1, min_support=1, n_cores=1)
    ours = discover_scan_stacks(Path(root), (1, 1, 1),
                                z_stepper_distance=Z_STEP,
                                piezo_distance=SUB_PLANES)
    assert set(ours) == set(ref._stacks) == set(truth)
    for k, s in ours.items():
        r = ref._stacks[k]
        assert (s.x0, s.y0, s.z0) == (r.x0, r.y0, r.z0), k
        assert [p.name for p in s.paths] == [p.name for p in r.paths], k


def test_pairwise_alignments_match_reference_and_truth(tree):
    root, truth = tree
    rscan = _load_reference_scan()
    ref = rscan.Scanner(Path(root), voxel_size=(1, 1, 1),
                        z_stepper_distance=Z_STEP, piezo_distance=SUB_PLANES,
                        z_skip=2, x_slop=5, y_slop=5, z_slop=Z_SLOP,
                        dark=100, decimate=1, min_support=1, n_cores=1)
    ref.align_all_stacks()

    ours = OurScanner(
        discover_scan_stacks(Path(root), (1, 1, 1),
                             z_stepper_distance=Z_STEP,
                             piezo_distance=SUB_PLANES),
        dark=100.0, slop=(5, 5, 4))
    ours.align_all_stacks(rounds=1)

    n_checked = 0
    for axis, k0, k1 in _adjacent_pairs(truth):
        t = np.array(truth[k1]) - np.array(truth[k0])  # (dx, dy, dz)
        score, rx, ry, rz = ref.get_alignment(k0, k1)
        if axis == 0:      # align_one_x: (dx, -dy, dz)
            ref_off = np.array([rx, -ry, rz])
        elif axis == 1:    # align_one_y: (-dx, dy, dz)
            ref_off = np.array([-rx, ry, rz])
        else:              # align_one_z: (-dx, -dy, dz - len)
            ref_off = np.array([-rx, -ry, SUB_PLANES + rz])
        cv, ch, cd = ours.alignments[(k0, k1)]
        our_off = np.array([ch, cv, cd])

        # a z offset at/past the last source plane has no overlapping
        # content: neither engine can observe it (the reference clamps to
        # its last-z_slop window; ours to the existing planes)
        observable = t[2] < SUB_PLANES if axis == 2 else True
        if observable:
            assert np.all(np.abs(ref_off - t) <= 1), \
                (axis, k0, k1, ref_off, t, score)
            assert np.all(np.abs(our_off - t) <= 1), \
                (axis, k0, k1, our_off, t)
            n_checked += 1
    assert n_checked >= 10


@pytest.mark.parametrize("seed,n_x,n_y,jitter", [
    (21, 3, 2, 3),
    (22, 2, 3, 1),
    (23, 3, 1, 2),
])
def test_scan_alignments_golden_fuzz(tmp_path, seed, n_x, n_y, jitter):
    """Geometry fuzz of the dragonfly scan path: other grid extents and
    jitters (same tile shape, so the jitted NCC programs are shared with
    the fixture tests) — discovery, pairwise alignments and truth
    recovery vs the reference Scanner run verbatim."""
    root = tmp_path / "tree"
    rng = np.random.default_rng(seed)
    truth, _ = write_dragonfly_tree(root, rng, n_x=n_x, n_y=n_y,
                                    jitter=jitter)
    rscan = _load_reference_scan()
    ref = rscan.Scanner(Path(root), voxel_size=(1, 1, 1),
                        z_stepper_distance=Z_STEP, piezo_distance=SUB_PLANES,
                        z_skip=2, x_slop=5, y_slop=5, z_slop=Z_SLOP,
                        dark=100, decimate=1, min_support=1, n_cores=1)
    ref.align_all_stacks()
    stacks = discover_scan_stacks(Path(root), (1, 1, 1),
                                  z_stepper_distance=Z_STEP,
                                  piezo_distance=SUB_PLANES)
    assert set(stacks) == set(ref._stacks) == set(truth)
    ours = OurScanner(stacks, dark=100.0, slop=(5, 5, 4))
    ours.align_all_stacks(rounds=1)
    n_checked = 0
    for axis, k0, k1 in _adjacent_pairs(truth):
        t = np.array(truth[k1]) - np.array(truth[k0])
        score, rx, ry, rz = ref.get_alignment(k0, k1)
        if axis == 0:
            ref_off = np.array([rx, -ry, rz])
        elif axis == 1:
            ref_off = np.array([-rx, ry, rz])
        else:
            ref_off = np.array([-rx, -ry, SUB_PLANES + rz])
        cv, ch, cd = ours.alignments[(k0, k1)]
        our_off = np.array([ch, cv, cd])
        observable = t[2] < SUB_PLANES if axis == 2 else True
        if observable:
            assert np.all(np.abs(ref_off - t) <= 1), \
                (axis, k0, k1, ref_off, t, score)
            assert np.all(np.abs(our_off - t) <= 1), \
                (axis, k0, k1, our_off, t)
            n_checked += 1
    assert n_checked >= (n_x - 1) * n_y + (n_y - 1) * n_x
