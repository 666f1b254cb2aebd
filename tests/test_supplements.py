"""Supplements: SWC/ESWC/APO ops, TifStack, NRRD codec, FNT cubes, Wiener RL."""

import numpy as np
import pandas as pd
import pytest

from ipp_tpu.io import tiff as tio
from ipp_tpu.io.nrrd import read_nrrd, write_nrrd
from ipp_tpu.utils import reconops as ro
from ipp_tpu.utils.tifstack import TifStack, natural_sorted


def _sample_swc():
    return pd.DataFrame({
        "id": [5, 2, 9], "type": [1, 3, 3],
        "x": [10.0, 20.0, 30.0], "y": [1.0, 2.0, 3.0],
        "z": [0.5, 1.5, 2.5], "radius": [4.0, 1.0, 1.0],
        "parent_id": [-1, 5, 2],
    })


def test_swc_roundtrip(tmp_path):
    df = _sample_swc()
    p = ro.write_swc(df, tmp_path / "n.swc", comment="test")
    df2 = ro.read_swc(p)
    pd.testing.assert_frame_equal(df.reset_index(drop=True),
                                  df2[ro.SWC_COLUMNS], check_dtype=False)


def test_eswc_roundtrip(tmp_path):
    df = _sample_swc()
    p = ro.write_eswc(df, tmp_path / "n.ano.eswc")
    df2 = ro.read_eswc(p)
    assert list(df2.columns) == ro.SWC_COLUMNS + ro.ESWC_COLUMNS
    np.testing.assert_allclose(df2["x"], df["x"])


def test_apo_conversion(tmp_path):
    apo = tmp_path / "cells.apo"
    apo.write_text("n,orderinfo,name,comment,z,x,y,pixmax,intensity,sdev,"
                   "volsize,mass\n"
                   "1,,,,5.0,10.0,20.0,0,0,0,0,0\n"
                   "2,,,,6.0,11.0,21.0,0,0,0,0,0\n")
    df = ro.read_apo(apo, radius=7.0)
    assert list(df["id"]) == [1, 2]
    assert (df["parent_id"] == -1).all()
    assert (df["radius"] == 7.0).all()
    np.testing.assert_allclose(df["x"], [10.0, 11.0])


def test_sort_swc_topological():
    df = _sample_swc()
    out = ro.sort_swc(df)
    assert list(out["id"]) == [1, 2, 3]
    assert list(out["parent_id"]) == [-1, 1, 2]
    # coordinates follow their nodes
    np.testing.assert_allclose(out["x"], [10.0, 20.0, 30.0])


def test_flip_and_scale():
    df = _sample_swc()
    out = ro.flip_and_scale(df, flip_lengths=(100, 0, 0),
                            voxel_source=(2, 1, 1), voxel_target=(1, 1, 1))
    np.testing.assert_allclose(out["x"], [(100 - 10) * 2, (100 - 20) * 2,
                                          (100 - 30) * 2])
    np.testing.assert_allclose(out["y"], df["y"])


def test_tifstack(tmp_path, rng):
    imgs = [(rng.random((16, 20)) * 1000).astype(np.uint16)
            for _ in range(4)]
    # deliberately non-lexicographic names to exercise natural sorting
    for i, name in enumerate(["s2.tif", "s10.tif", "s1.tif", "s3.tif"]):
        tio.imwrite(tmp_path / name, imgs[i])
    ts = TifStack(tmp_path)
    assert ts.shape == (4, 16, 20)
    order = natural_sorted(["s2.tif", "s10.tif", "s1.tif", "s3.tif"])
    assert order == ["s1.tif", "s2.tif", "s3.tif", "s10.tif"]
    np.testing.assert_array_equal(ts[0], imgs[2])  # s1
    assert ts[99] is None


@pytest.mark.parametrize("encoding", ["raw", "gzip"])
def test_nrrd_roundtrip(tmp_path, rng, encoding):
    vol = (rng.random((5, 12, 18)) * 60000).astype(np.uint16)
    p = write_nrrd(tmp_path / "c.nrrd", vol, encoding=encoding)
    out, header = read_nrrd(p)
    np.testing.assert_array_equal(out, vol)
    assert header["type"] == "uint16"
    assert header["sizes"] == "18 12 5"


def test_fnt_cube_pipeline(tmp_path, rng):
    from scipy.ndimage import convolve as ndi_convolve, gaussian_filter

    from ipp_tpu.ops.psf import gaussian_psf
    from ipp_tpu.pipeline.fnt_cubes import process_cubes

    truth = gaussian_filter(
        (rng.random((10, 40, 40)) > 0.995).astype(np.float32) * 3000, 1.0)
    psf = gaussian_psf((5, 5, 5), (1.0, 1.0, 1.0))
    blurred = np.clip(ndi_convolve(truth, psf, mode="constant"), 0,
                      65535).astype(np.uint16)
    in_dir = tmp_path / "cubes"
    in_dir.mkdir()
    write_nrrd(in_dir / "cube_000.nrrd", blurred)
    n = process_cubes(in_dir, tmp_path / "dec", voxel_um=(4.0, 2.0, 2.0),
                      niter=5)
    assert n == 1
    out, _ = read_nrrd(tmp_path / "dec" / "cube_000.nrrd")
    assert out.shape == blurred.shape
    c_blur = np.corrcoef(blurred.ravel(), truth.ravel())[0, 1]
    c_dec = np.corrcoef(out.astype(np.float32).ravel(), truth.ravel())[0, 1]
    assert c_dec >= c_blur - 0.02


def test_wiener_rl_refines_psf(rng):
    from scipy.ndimage import convolve as ndi_convolve, gaussian_filter

    from ipp_tpu.ops.deconv import richardson_lucy_wiener
    from ipp_tpu.ops.psf import gaussian_psf

    truth = gaussian_filter(
        (rng.random((24, 24, 24)) > 0.99).astype(np.float32) * 1000, 0.8)
    psf_true = gaussian_psf((7, 7, 7), (1.5, 1.5, 1.5))
    blurred = ndi_convolve(truth, psf_true, mode="constant").astype(np.float32)
    # start from a WRONG psf (narrower)
    psf_guess = gaussian_psf((7, 7, 7), (1.0, 1.0, 1.0))
    dec, psf_out = richardson_lucy_wiener(blurred, psf_guess, niter=4)
    psf_out = np.asarray(psf_out)
    assert dec.shape == truth.shape
    assert np.isfinite(np.asarray(dec)).all()
    assert abs(psf_out.sum() - 1.0) < 1e-3
    # the Wiener update must have adapted the PSF away from the guess.
    # Blind deconvolution is unstable on sparse phantoms (the reference
    # flags its adaptive_psf path as experimental too), so the contract is
    # adaptation + finite output + retained structure, not convergence.
    assert np.abs(psf_out - np.asarray(psf_guess)).sum() > 1e-3
    c = np.corrcoef(np.asarray(dec).ravel(), truth.ravel())[0, 1]
    assert c > 0.25


def test_check_files_finds_damaged(tmp_path, rng):
    """supplements/check_files.py role: damaged files reported/deleted."""
    from ipp_tpu.utils.checkfiles import check_files

    good = tmp_path / "good.tif"
    tio.imwrite(good, rng.integers(0, 100, (8, 8)).astype(np.uint16))
    bad = tmp_path / "bad.tif"
    bad.write_bytes(b"II*\0garbage")
    empty = tmp_path / "empty.nrrd"
    empty.write_bytes(b"")
    found = check_files(tmp_path, delete=True, timeout=20)
    names = {p.name for p in found}
    assert names == {"bad.tif", "empty.nrrd"}
    assert good.exists() and not bad.exists()


def test_check_files_bounded_when_all_workers_hang(tmp_path, monkeypatch):
    """A fully-wedged worker pool (NFS-stall scenario: every decode hangs)
    must not make check_files loop forever: queued files that never start
    are reported as unverified within the overall deadline."""
    import time as _time

    from ipp_tpu.utils import checkfiles as cf

    for i in range(3):
        (tmp_path / f"f{i}.tif").write_bytes(b"II*\0hang")

    monkeypatch.setattr(cf, "_decode", lambda p: _time.sleep(8.0))
    t0 = _time.monotonic()
    bad, unchecked = cf.check_files(tmp_path, delete=True, timeout=0.5,
                                    workers=1, return_unchecked=True)
    elapsed = _time.monotonic() - t0
    assert elapsed < 6.0  # deadline = timeout * (ceil(3/1)+1) = 2 s
    assert len(bad) + len(unchecked) == 3
    assert len(unchecked) >= 1  # the stalled-queue files are separated out
    # unchecked files are NEVER deleted (they may be healthy); only files
    # whose decode actually began and timed out may be unlinked
    assert all(p.exists() for p in unchecked)


def test_find_swc_location_soma_in_mesh(tmp_path):
    """supplements/find_swc_location.py role: soma-inside-region lookup
    with a native OBJ ray-casting containment test."""
    from ipp_tpu.utils.reconops import (find_swc_location, load_obj_mesh,
                                        points_inside_mesh)

    # unit cube OBJ
    cube = """\
v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nv 0 0 1\nv 1 0 1\nv 1 1 1\nv 0 1 1
f 1 2 3 4\nf 5 8 7 6\nf 1 5 6 2\nf 2 6 7 3\nf 3 7 8 4\nf 5 1 4 8
"""
    obj = tmp_path / "cube.obj"
    obj.write_text(cube)
    tris = load_obj_mesh(obj)
    assert tris.shape[1:] == (3, 3)
    inside = points_inside_mesh(
        tris, np.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [0.9, 0.1, 0.2]]))
    assert inside.tolist() == [True, False, True]

    rec = tmp_path / "recons"
    rec.mkdir()
    (rec / "in.swc").write_text("1 1 0.4 0.5 0.6 1.0 -1\n")
    (rec / "out.swc").write_text("1 1 5.0 5.0 5.0 1.0 -1\n")
    hits = find_swc_location(rec, obj, out_dir=tmp_path / "sel")
    assert [h.name for h in hits] == ["in.swc"]
    assert (tmp_path / "sel" / "in.swc").exists()


def test_command_generator_round_robin(tmp_path):
    from ipp_tpu.pipeline.command_generator import generate_commands

    cases = [tmp_path / f"case{i}" for i in range(5)]
    cmds = generate_commands(cases, "process {input} --name {name}",
                             n_nodes=2)
    assert len(cmds) == 2  # one bucket per node
    assert sum(len(b) for b in cmds) == 5
    flat = [c for b in cmds for c in b]
    assert any("case0" in c for c in flat)


def test_next_fast_len_smoothness():
    from ipp_tpu.ops.fftutil import next_fast_len

    for n in (1, 7, 100, 257, 263, 1025):
        m = next_fast_len(n)
        assert m >= n
        x = m
        for p in (2, 3, 5, 7):
            while x % p == 0:
                x //= p
        assert x == 1, (n, m)
    assert next_fast_len(256) == 256
    assert next_fast_len(264) == 270


def test_stage_timer_and_trace(tmp_path):
    from ipp_tpu.utils.progress import StageTimer
    from ipp_tpu.utils.tracing import annotate, trace_to

    t = StageTimer()
    t.start("a")
    t.start("b")
    rep = t.report()
    assert "a" in rep and "b" in rep
    with annotate("x"):
        pass
    with trace_to(tmp_path / "trace", enabled=False):
        pass


def test_pfc_to_ls_layout(tmp_path, rng=np.random.default_rng(7)):
    """supplements/PFC_to_LS.m:27-80 mapping: reverse-sorted Y folders ->
    columns, numerically-sorted X tokens -> rows, z from folder index;
    missing planes become blank frames; existing targets kept (cp -u)."""
    from ipp_tpu.pipeline.tsv_tools import pfc_to_ls

    root = tmp_path / "pfc"
    planes = {}
    shape = (12, 10)
    for z in ("Z00", "Z01"):
        for y in ("Y1", "Y2"):
            for x in ("X000010", "X000002"):
                if (z, y, x) == ("Z01", "Y1", "X000010"):
                    continue                      # the missing plane
                img = rng.integers(1, 60000, shape).astype(np.uint16)
                d = root / z / y
                d.mkdir(parents=True, exist_ok=True)
                tio.imwrite(d / f"{z}_{y}_{x}.tif", img)
                planes[(z, y, x)] = img

    target = tmp_path / "ls"
    n = pfc_to_ls(root, target, xy_step=100, z_step=20, frame_shape=shape)
    assert n == 8                                  # 2z x 2y x 2x

    # Y2 (reverse-sorted first) -> column 1 (sX=000100); X000002 (numeric
    # sort, beats lexical) -> row 1 (sY=000100); Z00 -> 000000.tif
    got = tio.imread(target / "000100" / "000100_000100" / "000000.tif")
    np.testing.assert_array_equal(got, planes[("Z00", "Y2", "X000002")])
    got = tio.imread(target / "000200" / "000200_000100" / "000020.tif")
    np.testing.assert_array_equal(got, planes[("Z01", "Y2", "X000010")])

    # the missing (Z01, Y1, X000010) -> row 2 (X000010), col 2 (Y1): blank
    blank = tio.imread(target / "000200" / "000200_000200" / "000020.tif")
    np.testing.assert_array_equal(blank, np.zeros(shape, np.uint16))

    # rerun: nothing rewritten (cp -u semantics)
    assert pfc_to_ls(root, target, 100, 20, frame_shape=shape) == 0


def test_command_generator_batch_reference_rules(tmp_path):
    """Per-case batch synthesis reproduces the reference's rules
    (command_generator_batch.py:35-250): CMYK channel flags by index,
    single-channel merge skip, metadata.txt voxel parsing (line 2,
    word 4, rounded 0.1, same value for xy and z), mip/middle channel
    exclusion, ims source selection and filename derivation."""
    from ipp_tpu.pipeline.command_generator import (_ims_filename,
                                                    generate_batch_commands)

    # multi-channel acquisition with previews to ignore
    a = tmp_path / "2024_01_01_12_00_00_SM1234_stitched"
    for ch in ("Ex_488_Em_525", "Ex_561_Em_600", "Ex_488_MIP",
               "Ex_561_middle", "notes"):
        (a / ch).mkdir(parents=True)
    (a / "metadata.txt").write_text("header\nvoxel info is 0.4199 um\n")
    # single-channel acquisition
    b = tmp_path / "2024_02_02_13_00_00_SM9999_stitched"
    (b / "Ex_642_Em_690").mkdir(parents=True)
    (b / "ACQ_metadata.txt").write_text("h\na b c 1.02 d\n")

    cmds = generate_batch_commands(
        [a, b], goal=0, composite_root=tmp_path / "merged",
        fnt_root=tmp_path / "fnt", ims_root=tmp_path / "ims")

    # merge: only the 2-channel case, cyan/magenta by sort order,
    # previews and non-Ex dirs excluded
    assert cmds["merge"].count("merge_channels") == 1
    assert f"--cyan {a / 'Ex_488_Em_525'}" in cmds["merge"]
    assert f"--magenta {a / 'Ex_561_Em_600'}" in cmds["merge"]
    assert "MIP" not in cmds["merge"] and "middle" not in cmds["merge"]
    assert "notes" not in cmds["merge"]

    # fnt: one command per real channel, voxels rounded to 0.1
    assert cmds["fnt"].count("--fnt") == 3
    assert "-dx 0.4 -dy 0.4 -dz 0.4" in cmds["fnt"]
    assert "-dx 1.0 -dy 1.0 -dz 1.0" in cmds["fnt"]

    # ims: multi-channel reads the merged composite, single-channel the
    # channel dir itself; filename strips _stitched and keeps parts
    # [0] + [4:] (reference :211-214)
    assert str(tmp_path / "merged" / a.name) in cmds["ims"]
    assert str(b / "Ex_642_Em_690") in cmds["ims"]
    assert _ims_filename(a.name) == "2024_00_00_SM1234.ims"
    assert " && " in cmds["ims"] or cmds["ims"].count("convert") >= 2

    # goal semantics: 1 = merge only, 3 = fnt only, 2 = unsupported
    only_merge = generate_batch_commands([a], goal=1)
    assert only_merge["merge"] and not only_merge["fnt"] \
        and not only_merge["ims"]
    only_fnt = generate_batch_commands([a], goal=3)
    assert only_fnt["fnt"] and not only_fnt["merge"] and not only_fnt["ims"]
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        generate_batch_commands([a], goal=2)

    # fnt channel restriction (the interactive confirm's role)
    sel = generate_batch_commands([a], goal=3,
                                  fnt_channels=["Ex_488_Em_525"])
    assert sel["fnt"].count("--fnt") == 1


def test_command_generator_batch_quotes_paths(tmp_path):
    """Paths with spaces must be shell-quoted in the synthesized
    commands (they run via shell=True with --run)."""
    import shlex

    from ipp_tpu.pipeline.command_generator import generate_batch_commands

    a = tmp_path / "Case 01_stitched"
    for ch in ("Ex_488_Em_525_stitched", "Ex_561_Em_600_stitched"):
        (a / ch).mkdir(parents=True)
    (a / "metadata.txt").write_text("um/pix\t0.4\nz_step_um\t1.0\n")
    cmds = generate_batch_commands(
        [a], goal=0, composite_root=tmp_path / "merged out",
        fnt_root=tmp_path / "fnt", ims_root=tmp_path / "ims")
    for kind in ("merge", "fnt", "ims"):
        for cmd in cmds[kind].split(" && "):
            if not cmd:
                continue
            toks = shlex.split(cmd)  # must tokenize cleanly
            # every path token containing the case name survives intact
            assert any("Case 01_stitched" in t for t in toks), (kind, cmd)


def test_merge_channels_resume_skips_existing(tmp_path):
    """--resume (reference default) leaves already-written composite
    planes untouched and fills in the missing ones."""
    import numpy as np

    from ipp_tpu.io import tiff as tio
    from ipp_tpu.pipeline.merge_channels import main

    a = tmp_path / "A"
    a.mkdir()
    for z in range(3):
        tio.imwrite(a / f"img_{z:04d}.tif",
                    np.full((16, 16), 40 * (z + 1), np.uint8))
    out = tmp_path / "rgb"
    out.mkdir()
    sentinel = np.full((16, 16, 3), 7, np.uint8)
    tio.imwrite(out / "composite_000001.tif", sentinel)
    rc = main(["--red", str(a), "-o", str(out), "--no-align"])
    assert rc == 0
    assert sorted(p.name for p in out.glob("composite_*.tif")) == [
        f"composite_{z:06d}.tif" for z in range(3)]
    np.testing.assert_array_equal(tio.imread(out / "composite_000001.tif"),
                                  sentinel)  # resume kept it
    rc = main(["--red", str(a), "-o", str(out), "--no-align",
               "--no-resume"])
    assert rc == 0
    assert tio.imread(out / "composite_000001.tif")[0, 0, 0] == 80
