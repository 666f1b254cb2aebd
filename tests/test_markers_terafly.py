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


def test_vaa3d_raw_layout_golden(tmp_path, rng):
    """Byte-level golden of the Vaa3D raw layout against the reference's
    documented format (RawFmtMngr.cpp:226-331): magic, endian code,
    int16 datatype code, sz[4]=(x,y,z,c) uint32, then c/z/y/x data —
    a file built independently from the spec must decode, and our writer
    must produce exactly that layout."""
    import struct

    from ipp_tpu.io.vaa3draw import (VAA3D_MAGIC, vaa3d_raw_info,
                                     vaa3d_raw_read, vaa3d_raw_read_plane,
                                     vaa3d_raw_write)

    vol = (rng.random((3, 5, 7)) * 60000).astype(np.uint16)  # (z, y, x)
    # hand-built file straight from the reference's parse order
    spec = tmp_path / "spec.raw"
    spec.write_bytes(VAA3D_MAGIC + b"L" + struct.pack("<h", 2)
                     + struct.pack("<4I", 7, 5, 3, 1)
                     + vol.astype("<u2").tobytes())
    np.testing.assert_array_equal(vaa3d_raw_read(spec), vol)
    dt, shape = vaa3d_raw_info(spec)
    assert shape == (1, 3, 5, 7)

    # our writer's bytes == the hand-built spec bytes
    ours = tmp_path / "ours.raw"
    vaa3d_raw_write(ours, vol)
    assert ours.read_bytes() == spec.read_bytes()

    # big-endian files (written by PPC-era Vaa3D) decode too
    be = tmp_path / "be.raw"
    be.write_bytes(VAA3D_MAGIC + b"B" + struct.pack(">h", 2)
                   + struct.pack(">4I", 7, 5, 3, 1)
                   + vol.astype(">u2").tobytes())
    np.testing.assert_array_equal(vaa3d_raw_read(be), vol)
    np.testing.assert_array_equal(vaa3d_raw_read_plane(be, 1), vol[1])


def test_terafly_vaa3draw_blocks(tmp_path, rng):
    """export_terafly(block_format='vaa3draw'): blocks are z-chunked Vaa3D
    raw stacks (the reference's mergeTilesVaa3DRaw output,
    StackStitcher.h:338); the pyramid reads back identical to the tiff2d
    layout at every level."""
    from ipp_tpu.io.terafly import TeraFlyVolume, export_terafly

    nz, ny, nx = 9, 48, 40
    vol = (rng.random((nz, ny, nx)) * 60000).astype(np.uint16)
    t_tif = export_terafly(lambda z: vol[z], (nz, ny, nx),
                           tmp_path / "tf_tif", block_yx=(32, 32),
                           n_resolutions=2)
    t_raw = export_terafly(lambda z: vol[z], (nz, ny, nx),
                           tmp_path / "tf_raw", block_yx=(32, 32),
                           n_resolutions=2, block_format="vaa3draw",
                           block_z=4)
    raw_files = list((tmp_path / "tf_raw").rglob("*.raw"))
    assert raw_files and not list((tmp_path / "tf_raw").rglob("*.tif"))
    # z chunking: level 0 has ceil(9/4)=3 chunks per block
    from ipp_tpu.io.vaa3draw import vaa3d_raw_info

    depths = sorted(vaa3d_raw_info(p)[1][1] for p in raw_files
                    if "RES(48x40x9)" in str(p))
    assert depths[0] == 1 and depths[-1] == 4  # 4+4+1 per block
    for lv in range(2):
        a = TeraFlyVolume(t_tif, resolution=lv)
        b = TeraFlyVolume(t_raw, resolution=lv)
        assert a.shape == b.shape
        for z in (0, a.shape[2] // 2, a.shape[2] - 1):
            np.testing.assert_array_equal(a.read_plane(z), b.read_plane(z))

    # mdata-less read (directory scan fallback) also works
    (tmp_path / "tf_raw" / "RES(48x40x9)" / "mdata.bin").unlink()
    c = TeraFlyVolume(t_raw, resolution=0)
    np.testing.assert_array_equal(c.read_plane(5), vol[5])
