"""Marker utilities, TeraFly readback, crop/resize3d, displacement merge."""

import numpy as np
import pandas as pd
import pytest

from ipp_tpu.io import tiff as tio
from ipp_tpu.utils.markers import (convert_coordinates, merge_marker_files,
                                   read_marker, write_marker)


def test_marker_roundtrip_and_merge(tmp_path):
    df1 = pd.DataFrame({"x": [10.0, 20.0], "y": [1.0, 2.0], "z": [5.0, 6.0],
                        "radius": [3, 3], "shape": [1, 1],
                        "name": ["a", "b"], "comment": ["", ""],
                        "color_r": [255, 255], "color_g": [0, 0],
                        "color_b": [0, 0]})
    p1 = write_marker(df1, tmp_path / "a.marker")
    df2 = df1.copy()
    df2["x"] = [10.2, 50.0]  # first point is a near-duplicate
    p2 = write_marker(df2, tmp_path / "b.marker")
    merged = read_marker(merge_marker_files([p1, p2], tmp_path / "m.marker",
                                            dedup_radius=1.0))
    assert len(merged) == 3  # 2 + 2 - 1 duplicate


def test_convert_coordinates():
    df = pd.DataFrame({"x": [10.0], "y": [20.0], "z": [5.0]})
    out = convert_coordinates(df, voxel_source=(2, 1, 1),
                              voxel_target=(1, 1, 1),
                              flip_lengths=(0, 100, 0), offset=(1, 0, 0))
    assert out["x"].iloc[0] == 21.0
    assert out["y"].iloc[0] == 80.0
    assert out["z"].iloc[0] == 5.0


def test_terafly_readback(tmp_path, rng):
    from ipp_tpu.io.terafly import TeraFlyVolume, tif_series_to_terafly

    vol = (rng.random((4, 96, 128)) * 60000).astype(np.uint16)
    d = tmp_path / "s"
    d.mkdir()
    for z in range(4):
        tio.imwrite(d / f"img_{z:06d}.tif", vol[z])
    out = tif_series_to_terafly(d, tmp_path / "tf", voxel_um=(1, 1, 1),
                                block_yx=(64, 64), n_resolutions=1)
    tv = TeraFlyVolume(out, resolution=0)
    assert tv.shape == (96, 128, 4)
    np.testing.assert_array_equal(tv.read_plane(2), vol[2])
    np.testing.assert_array_equal(tv[1:3], vol[1:3])


def test_crop_and_resize3d(tmp_path, rng):
    from ipp_tpu.pipeline.tsv_tools import crop_series, resize3d_series

    vol = (rng.random((4, 40, 60)) * 1000).astype(np.uint16)
    d = tmp_path / "s"
    d.mkdir()
    for z in range(4):
        tio.imwrite(d / f"img_{z:06d}.tif", vol[z])
    n = crop_series(d, tmp_path / "c", 5, 25, 10, 50, z0=1, z1=3)
    assert n == 2
    np.testing.assert_array_equal(tio.imread(tmp_path / "c" / "img_000000.tif"),
                                  vol[1, 5:25, 10:50])
    out = resize3d_series(d, tmp_path / "r", (2, 20, 30))
    imgs = sorted(out.glob("*.tif"))
    assert len(imgs) == 2
    assert tio.imread(imgs[0]).shape == (20, 30)


def test_merge_displacement_candidates():
    from ipp_tpu.geometry.stacks import Displacement
    from ipp_tpu.stitch.align import merge_displacement_candidates

    d1 = {(1, 0, "north"): [Displacement(displ=(1, 0, 0))]}
    d2 = {(1, 0, "north"): [Displacement(displ=(2, 0, 0))],
          (0, 1, "west"): [Displacement(displ=(0, 3, 0))]}
    m = merge_displacement_candidates([d1, d2])
    assert len(m[(1, 0, "north")]) == 2
    assert len(m[(0, 1, "west")]) == 1


def test_mdata_bin_roundtrip_and_fastload(tmp_path, rng):
    """export_terafly emits mdata.bin per level (StackedVolume binary
    metadata, version 2); the reader round-trips it and uses it to load
    blocks without a directory walk."""
    from ipp_tpu.io.terafly import (TeraFlyVolume, read_mdata_bin,
                                    tif_series_to_terafly)

    src = tmp_path / "src"
    src.mkdir()
    vol = (rng.random((6, 128, 160)) * 1000).astype(np.uint16)
    for z in range(6):
        tio.imwrite(src / f"img_{z:06d}.tif", vol[z])
    out = tif_series_to_terafly(src, tmp_path / "tf", voxel_um=(2, 1, 1),
                                block_yx=(64, 64), n_resolutions=2)
    for res_dir in out.glob("RES(*)"):
        info = read_mdata_bin(res_dir / "mdata.bin")
        assert info["version"] == 2.0
        assert info["axes"] == (1, 2, 3)
        n_files = sum(len(s["filenames"])
                      for row in info["stacks"] for s in row)
        assert n_files == sum(1 for _ in res_dir.rglob("*.tif"))
    tf = TeraFlyVolume(out, resolution=0, voxel_um=(2, 1, 1))
    np.testing.assert_array_equal(tf.read_plane(3), vol[3])
    tf1 = TeraFlyVolume(out, resolution=1, voxel_um=(2, 1, 1))
    assert tf1.shape[0] == 64 and tf1.shape[1] == 80
    assert len(tf1) == 3
    p = tf1.read_plane(0)
    assert p.shape == (64, 80)


def test_regenerate_mdata_matches_export(tmp_path, rng):
    """mdatagenerator role: deleting mdata.bin and regenerating it from
    the directory scan reproduces the exported stack table."""
    from ipp_tpu.io.terafly import (read_mdata_bin, regenerate_mdata,
                                    tif_series_to_terafly)

    src = tmp_path / "src"
    src.mkdir()
    for z in range(4):
        tio.imwrite(src / f"img_{z:06d}.tif",
                    (rng.random((96, 128)) * 100).astype(np.uint16))
    out = tif_series_to_terafly(src, tmp_path / "tf", block_yx=(64, 64),
                                n_resolutions=1)
    res = next(out.glob("RES(*)"))
    orig = read_mdata_bin(res / "mdata.bin")
    (res / "mdata.bin").unlink()
    regenerate_mdata(res)
    regen = read_mdata_bin(res / "mdata.bin")
    assert regen["dim"] == orig["dim"]
    for r0, r1 in zip(orig["stacks"], regen["stacks"]):
        for s0, s1 in zip(r0, r1):
            assert s0 == s1
