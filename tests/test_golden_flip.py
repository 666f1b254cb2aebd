"""Golden cross-validation of the TIFF-series flipper against the
reference's OWN flip_script.py, run VERBATIM (serialized pool, shimmed
tifffile/tqdm).  Covers out-of-place x/y flips, the z-flip
reversed-filename mapping (flip_script.py:99-101), and the in-place
pairwise z swap (:60-76; driven WITH -z, where our semantics and the
reference's agree — see ipp_tpu/pipeline/flip.py for the documented
in-place-without-z deviation)."""

import sys

import numpy as np
import pytest

from ipp_tpu.io import tiff as tio
from ipp_tpu.pipeline.flip import flip_series
from tests.refshims import REF, install_process_images_shims, install_shims

pytestmark = pytest.mark.skipif(
    not (REF / "flip_script.py").exists(),
    reason="reference flip_script unavailable")


class _SerialPool:
    def __init__(self, processes=None):
        pass

    def imap_unordered(self, fn, iterable):
        return map(fn, iterable)

    def close(self):
        pass

    def join(self):
        pass


@pytest.fixture(scope="module")
def ref_flip():
    install_shims()
    install_process_images_shims()  # tifffile.natural_sorted
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import flip_script as rf  # noqa: PLC0415

    rf.Pool = _SerialPool
    return rf


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _make_series(d, rng, nz=5, shape=(12, 16)):
    d.mkdir(parents=True)
    for z in range(nz):
        tio.imwrite(d / f"img_{z:04d}.tif",
                    rng.integers(0, 65535, shape).astype(np.uint16))
    return d


def _run_ref(ref_flip, monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", ["flip_script.py"] + argv)
    ref_flip.main()


def _series_equal(a, b):
    fa = sorted(a.glob("*.tif"))
    fb = sorted(b.glob("*.tif"))
    assert [p.name for p in fa] == [p.name for p in fb]
    for pa, pb in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(tio.imread(pa)),
                                      np.asarray(tio.imread(pb)))


@pytest.mark.parametrize("flags", [["-x"], ["-y"], ["-x", "-y"]])
def test_out_of_place_xy_matches_reference(ref_flip, monkeypatch, tmp_path,
                                           rng, flags):
    src = _make_series(tmp_path / "src", rng)
    _run_ref(ref_flip, monkeypatch,
             ["-i", str(src), "-o", str(tmp_path / "ref"), "-n", "1"]
             + flags)
    flip_series(src, tmp_path / "ours", flip_x="-x" in flags,
                flip_y="-y" in flags)
    _series_equal(tmp_path / "ref", tmp_path / "ours")


def test_out_of_place_z_matches_reference(ref_flip, monkeypatch, tmp_path,
                                          rng):
    """-z maps plane i's content to filename n-1-i (reversed dest list)."""
    src = _make_series(tmp_path / "src", rng)
    _run_ref(ref_flip, monkeypatch,
             ["-i", str(src), "-o", str(tmp_path / "ref"), "-z", "-x",
              "-n", "1"])
    flip_series(src, tmp_path / "ours", flip_x=True, flip_z=True)
    _series_equal(tmp_path / "ref", tmp_path / "ours")


def test_in_place_z_matches_reference(ref_flip, monkeypatch, tmp_path, rng):
    """No --output: the reference pairwise-swaps first/last (a z flip),
    x/y applied to both planes of each pair; odd middle plane flipped in
    place."""
    ref_dir = _make_series(tmp_path / "ref", rng, nz=5)
    rng2 = np.random.default_rng(42)
    our_dir = _make_series(tmp_path / "ours", rng2, nz=5)
    _run_ref(ref_flip, monkeypatch, ["-i", str(ref_dir), "-y", "-n", "1"])
    flip_series(our_dir, None, flip_y=True, flip_z=True)
    _series_equal(ref_dir, our_dir)
