"""Golden cross-validation of the recut/TeraFly/Imaris soma-seed
shuttles against the reference's OWN scripts, run VERBATIM
(supplements/convert_recut_terafly_imaris/*.py; real pandas, tqdm shim).

Formats pinned: recut marker_* file naming + '# x,y,z,radius_um'
content, TeraFly .ano/.ano.apo/.ano.eswc layout, and the consolidated
Imaris-proofread SWC.  Documented deviation: the reference's apo header
write lacks a trailing newline so its first record glues onto the header
(soma_recut_seed_to_terafly_ano.py:26-28); ours inserts the newline, and
the comparison accounts for it."""

import importlib.util
import sys
from argparse import Namespace
from math import pi

import numpy as np
import pytest

from ipp_tpu.utils.markers import (recut_seeds_to_terafly_ano,
                                   swc_to_recut_seeds,
                                   terafly_apo_to_recut_seeds)
from tests.refshims import REF, install_shims

CONV = REF / "supplements" / "convert_recut_terafly_imaris"

pytestmark = pytest.mark.skipif(not CONV.exists(),
                                reason="reference converters unavailable")


def _load(name):
    install_shims()
    spec = importlib.util.spec_from_file_location(name, CONV / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_seeds(d, rng, n=5):
    d.mkdir(parents=True)
    for i in range(n):
        x, y, z = rng.uniform(10, 500, 3).round(2)
        r = float(rng.uniform(4, 15))
        (d / f"marker_{int(x)}_{int(y)}_{int(z)}_{i}").write_text(
            f"# x,y,z,radius_um\n{x},{y},{z},{r}")
    return d


def test_recut_seeds_to_ano_matches_reference(tmp_path, rng):
    mod = _load("soma_recut_seed_to_terafly_ano")
    ref_dir = _write_seeds(tmp_path / "ref_seeds", np.random.default_rng(3))
    our_dir = _write_seeds(tmp_path / "our_seeds", np.random.default_rng(3))
    mod.main(Namespace(seeds=str(ref_dir), red=10, green=20, blue=30,
                       voxel_size_x=0.4, voxel_size_y=0.5,
                       voxel_size_z=2.0))
    recut_seeds_to_terafly_ano(our_dir, color=(10, 20, 30),
                               voxel=(0.4, 0.5, 2.0))
    ref_apo = (ref_dir / "ref_seeds.ano.apo").read_text()
    our_apo = (our_dir / "our_seeds.ano.apo").read_text()
    # the reference glues record 0 onto the header (no newline after the
    # header write); ours separates them — splice its header off
    header = ("##n,orderinfo,name,comment,z,x,y,pixmax,intensity,sdev,"
              "volsize,mass,,,,color_r,color_g,color_b")
    assert ref_apo.startswith(header)
    assert our_apo.splitlines()[0] == header

    def rows(text):
        # the reference's row order follows the OS's unsorted glob order
        # (nondeterministic); ours sorts marker files — compare records
        # with the positional index stripped, order-insensitively
        return sorted(ln.split(",", 1)[1]
                      for ln in text.strip().splitlines() if ln)

    assert rows(ref_apo[len(header):]) == \
        rows("\n".join(our_apo.splitlines()[1:]))
    # .ano references the sibling files; .eswc is the '#' stub
    assert (ref_dir / "ref_seeds.ano").read_text().replace("ref_", "x_") \
        == (our_dir / "our_seeds.ano").read_text().replace("our_", "x_")
    assert (our_dir / "our_seeds.ano.eswc").read_text() == "#"


def test_apo_to_recut_seeds_matches_reference(tmp_path, rng):
    mod = _load("soma_terafly_ano_to_recut_seed")

    def make_apo(d):
        d.mkdir(parents=True)
        apo = d / "somas.ano.apo"
        rows = ["##n,orderinfo,name,comment,z,x,y,pixmax,intensity,sdev,"
                "volsize,mass,,,,color_r,color_g,color_b"]
        r = np.random.default_rng(9)
        for i in range(4):
            z, x, y = r.uniform(20, 900, 3).round(1)
            vol = float(r.uniform(500, 9000))
            rows.append(f"{i},,,,{z},{x},{y},0.000,0.000,0.000,{vol},"
                        f"0.000,,,,0,0,255")
        apo.write_text("\n".join(rows) + "\n")
        return apo

    ref_apo = make_apo(tmp_path / "ref")
    our_apo = make_apo(tmp_path / "ours")
    mod.main(Namespace(apo_file=str(ref_apo), default_radius=0,
                       voxel_size_x=0.4, voxel_size_y=0.4,
                       voxel_size_z=2.0))
    out = terafly_apo_to_recut_seeds(our_apo, voxel=(0.4, 0.4, 2.0))
    ref_out = ref_apo.parent / "recut_seeds_from_marker"
    ref_files = sorted(p.name for p in ref_out.iterdir())
    our_files = sorted(p.name for p in out.iterdir())
    assert ref_files == our_files
    for name in ref_files:
        assert (ref_out / name).read_text() == (out / name).read_text()


def test_swc_to_recut_seeds_matches_reference(tmp_path, rng):
    mod = _load("convert_imaris_soma_to_markers")

    def make_swc(d):
        d.mkdir(parents=True)
        swc = d / "proofread.swc"
        r = np.random.default_rng(5)
        lines = []
        for i in range(4):
            x, y, z = r.uniform(30, 800, 3).round(2)
            lines.append(f"{i} 0 {x} {y} {z} 7.5 -1")
        swc.write_text("\n".join(lines) + "\n")
        return swc

    ref_swc = make_swc(tmp_path / "ref")
    our_swc = make_swc(tmp_path / "ours")
    mod.main(Namespace(soma=str(ref_swc), radii=9.0, voxel_size_x=0.4,
                       voxel_size_y=0.5, voxel_size_z=2.0))
    out = swc_to_recut_seeds(our_swc, radii=9.0, voxel=(0.4, 0.5, 2.0))
    ref_out = ref_swc.parent / "IMS_proofread_recut_seeds_proofread"
    ref_files = sorted(p.name for p in ref_out.iterdir())
    our_files = sorted(p.name for p in out.iterdir())
    assert ref_files == our_files and ref_files
    for name in ref_files:
        assert (ref_out / name).read_text() == (out / name).read_text()
    assert all(n.startswith(f"marker_") for n in our_files)
    assert int(our_files[0].split("_")[-1]) == int(4 / 3 * pi * 9.0 ** 3)
