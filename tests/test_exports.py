"""Export formats: Imaris .ims, TeraFly pyramid, DCIMG."""

import numpy as np
import pytest

from ipp_tpu.io import tiff as tio
from ipp_tpu.io.dcimg import DCIMGFile
from ipp_tpu.io.ims import ImarisReader, tif_series_to_imaris, write_imaris
from ipp_tpu.io.terafly import tif_series_to_terafly


@pytest.fixture()
def tif_series(tmp_path, rng):
    vol = (rng.random((6, 96, 128)) * 60000).astype(np.uint16)
    d = tmp_path / "series"
    d.mkdir()
    for z in range(vol.shape[0]):
        tio.imwrite(d / f"img_{z:06d}.tif", vol[z])
    return d, vol


def test_imaris_roundtrip(tmp_path, tif_series):
    d, vol = tif_series
    ims = tif_series_to_imaris(d, tmp_path / "out.ims", voxel_um=(2, 1, 1))
    with ImarisReader(ims) as r:
        assert r.shape == vol.shape
        np.testing.assert_array_equal(r[3], vol[3])
        stack = r[1:4]
        np.testing.assert_array_equal(stack, vol[1:4])


def test_imaris_is_valid_hdf5_with_pyramid(tmp_path, tif_series):
    import h5py

    d, vol = tif_series
    ims = write_imaris(tmp_path / "p.ims",
                       lambda z: vol[z], vol.shape, vol.dtype, n_levels=2)
    with h5py.File(ims, "r") as f:
        assert "DataSet/ResolutionLevel 0/TimePoint 0/Channel 0/Data" in f
        assert "DataSet/ResolutionLevel 1/TimePoint 0/Channel 0/Data" in f
        lvl1 = f["DataSet/ResolutionLevel 1/TimePoint 0/Channel 0/Data"]
        assert lvl1.shape[1] == vol.shape[1] // 2
        assert "DataSetInfo/Image" in f
        # level 1 mean-pools 2x2 in xy and pairs of z planes
        ref = vol.astype(np.float32)[:, :48 * 2, :64 * 2]
        ref = ref.reshape(6, 48, 2, 64, 2).mean(axis=(2, 4))
        ref_z0 = (ref[0] + ref[1]) / 2.0
        np.testing.assert_allclose(np.asarray(lvl1[0]).astype(np.float32),
                                   ref_z0, atol=1)


def test_imaris_schema_matches_reference(tmp_path, tif_series):
    """Schema-level assertions against the reference's Imaris5 layout
    (IMS_HDF5Mngr.cpp build_std_rootattributes :190-207 and
    build_std_filestruct :211-283): root attributes incl.
    ThumbnailDirectoryName, the DataSetInfo group tree (CustomData,
    ImarisDataSet, Image, Channel 0, Log, TimeInfo) with S1-encoded
    string attributes, and the Thumbnail group with RGBA data."""
    import h5py

    d, vol = tif_series
    ims = write_imaris(tmp_path / "s.ims", lambda z: vol[z], vol.shape,
                       vol.dtype, n_levels=2)

    def s(attrs, key):
        raw = attrs[key]
        assert raw.dtype.kind == "S" and raw.ndim == 1, (
            f"{key} must be an S1 char array (IMS attribute encoding)")
        return b"".join(bytes(x) for x in raw).decode()

    with h5py.File(ims, "r") as f:
        # root attributes (build_std_rootattributes)
        assert s(f.attrs, "DataSetDirectoryName") == "DataSet"
        assert s(f.attrs, "DataSetInfoDirectoryName") == "DataSetInfo"
        assert s(f.attrs, "ThumbnailDirectoryName") == "Thumbnail"
        assert s(f.attrs, "ImarisDataSet") == "ImarisDataSet"
        assert s(f.attrs, "ImarisVersion") == "5.5.0"
        # DataSetInfo tree (build_std_filestruct)
        info = f["DataSetInfo"]
        cd = info["CustomData"]
        assert s(cd.attrs, "Height") == str(vol.shape[1])
        assert s(cd.attrs, "Width") == str(vol.shape[2])
        assert s(cd.attrs, "NumberOfZPoints") == str(vol.shape[0])
        assert s(cd.attrs, "NumberOfChannels") == "1"
        assert s(cd.attrs, "NumberOfTimePoints") == "1"
        assert "DateAndTime" in cd.attrs
        ids = info["ImarisDataSet"]
        assert s(ids.attrs, "NumberOfImages") == "1"
        assert s(ids.attrs, "Version") == "5.5"
        assert "Creator" in ids.attrs
        img = info["Image"]
        for key in ("Name", "Description", "RecordingDate", "Unit",
                    "X", "Y", "Z", "ExtMin0", "ExtMax0"):
            assert key in img.attrs, key
        assert s(img.attrs, "Unit") == "um"
        ch = info["Channel 0"]
        assert s(ch.attrs, "Name") == "Channel 1"
        assert "Description" in ch.attrs
        assert s(info["Log"].attrs, "Entries") == "0"
        ti = info["TimeInfo"]
        assert s(ti.attrs, "DataSetTimePoints") == "1"
        assert s(ti.attrs, "FileTimePoints") == "1"
        assert "TimePoint1" in ti.attrs
        # Thumbnail group with RGBA rows (H, 4*W) uint8
        th = f["Thumbnail/Data"]
        assert th.dtype == np.uint8
        assert th.shape[1] % 4 == 0 and th[:].max() > 0


def test_terafly_pyramid_layout(tmp_path, tif_series):
    d, vol = tif_series
    out = tif_series_to_terafly(d, tmp_path / "terafly",
                                voxel_um=(2.0, 0.5, 0.5),
                                block_yx=(64, 64), n_resolutions=2)
    res0 = out / "RES(96x128x6)"
    res1 = out / "RES(48x64x3)"
    assert res0.is_dir() and res1.is_dir()
    # block dirs named in tenths of um: row 64 at 0.5 um -> 320
    assert (res0 / "000000" / "000000_000000").is_dir()
    assert (res0 / "000320" / "000320_000000").is_dir()
    assert (res0 / "000320" / "000320_000320").is_dir()
    # z plane files exist with tenths-of-um z names (z=1 -> 20)
    f = res0 / "000000" / "000000_000000" / "000000_000000_000020.tif"
    assert f.exists()
    blk = tio.imread(f)
    np.testing.assert_array_equal(blk, vol[1, :64, :64])
    # level 1 halves z (2 um -> 4 um): z index 1 -> 40
    f1 = res1 / "000000" / "000000_000000" / "000000_000000_000040.tif"
    assert f1.exists()
    assert tio.imread(f1).shape == (48, 64)


def test_dcimg_roundtrip(tmp_path, rng):
    frames = (rng.random((4, 32, 40)) * 60000).astype(np.uint16)
    p = tmp_path / "cam.dcimg"
    DCIMGFile.write(p, frames)
    d = DCIMGFile(p)
    assert d.shape == (4, 32, 40)
    assert d.dtype == np.uint16
    f2 = d[2]
    np.testing.assert_array_equal(f2[1:], frames[2][1:])
    # metadata-pixel fixup on row 0
    np.testing.assert_array_equal(f2[0, 4:], frames[2][0, 4:])
    np.testing.assert_array_equal(f2[0, :4], frames[2][1, :4])
    np.testing.assert_array_equal(d[1:3][0][1:], frames[1][1:])


def test_imaris_timeseries_roundtrip(tmp_path, rng):
    """4D time-series .ims (TeraStitcher TimeSeries.h role): one TimePoint
    group per t, TimeInfo carrying the timepoint count, readable per-t
    through ImarisReader."""
    from ipp_tpu.io.ims import ImarisReader, write_imaris_timeseries

    vol4 = (rng.random((3, 4, 32, 48)) * 60000).astype(np.uint16)
    ims = write_imaris_timeseries(tmp_path / "ts.ims",
                                  lambda t, z: vol4[t, z], vol4.shape,
                                  vol4.dtype)
    import h5py

    with h5py.File(ims, "r") as f:
        for t in range(3):
            assert f"DataSet/ResolutionLevel 0/TimePoint {t}/Channel 0/Data" in f
        ti = f["DataSetInfo/TimeInfo"].attrs
        assert b"".join(bytes(x) for x in ti["DataSetTimePoints"]) == b"3"
        assert "TimePoint3" in ti
    for t in range(3):
        with ImarisReader(ims, timepoint=t) as r:
            np.testing.assert_array_equal(r[2], vol4[t, 2])


def test_dcimg_new_format_roundtrip(tmp_path, rng):
    """DCAM-API-4 (format_version 0x2000000) session layout: per-frame
    footers, 64-bit data offset, no first-row metadata-pixel fixup
    (VERDICT r2 item 8; synthetic fixture pins the implemented layout)."""
    frames = (rng.random((3, 24, 56)) * 60000).astype(np.uint16)
    p = tmp_path / "cam2.dcimg"
    DCIMGFile.write(p, frames, format_version=0x2000000,
                    frame_footer_size=48)
    d = DCIMGFile(p)
    assert d.format_version == 0x2000000
    assert d.shape == (3, 24, 56)
    assert d.dtype == np.uint16
    for z in range(3):  # footer stride honored, pixels intact incl. row 0
        np.testing.assert_array_equal(d[z], frames[z])
    np.testing.assert_array_equal(d[0:3], frames)


def test_imaris_truncation_fuzz(tmp_path, tif_series):
    """Truncated .ims files must raise cleanly from ImarisReader, never
    hang or crash; an intact file keeps reading correctly."""
    d, vol = tif_series
    ims = tif_series_to_imaris(d, tmp_path / "full.ims")
    data = ims.read_bytes()
    for cut in (4, 100, 1024, len(data) // 3, len(data) - 9):
        q = tmp_path / f"cut_{cut}.ims"
        q.write_bytes(data[:cut])
        try:
            with ImarisReader(q) as r:
                got = r[0]
        except Exception:  # noqa: BLE001 - clean failure is correct
            continue
        # if HDF5 salvaged enough to read, the data must be right
        np.testing.assert_array_equal(got, vol[0])


def test_dcimg_truncation_fuzz(tmp_path, rng):
    """Truncated DCIMG files: header-destroying cuts must raise, and no
    cut may return a silently WRONG frame — a read that succeeds must
    equal the original data (only possible when the cut spared it)."""
    frames = (rng.random((2, 16, 16)) * 100).astype(np.uint16)
    for fmt in (0x7, 0x2000000):
        p = tmp_path / f"t{fmt:x}.dcimg"
        DCIMGFile.write(p, frames, format_version=fmt)
        data = p.read_bytes()
        for cut in (3, 10, 44, 100, len(data) // 2, len(data) - 7):
            q = tmp_path / f"cut{fmt:x}_{cut}.dcimg"
            q.write_bytes(data[:cut])
            try:
                d = DCIMGFile(q)
                got = d.read_frame(0)
            except Exception:  # noqa: BLE001 - clean failure is correct
                continue
            # a successful read must be the true frame, never garbage
            # (v1.0 applies the metadata-pixel fixup to row 0's first 4)
            want = frames[0].copy()
            if fmt < 0x1000000:
                want[0, :4] = frames[0][1, :4]
            np.testing.assert_array_equal(got, want)
        # cuts inside the 44-byte file header can never parse
        for cut in (3, 10):
            q = tmp_path / f"hdr{fmt:x}_{cut}.dcimg"
            q.write_bytes(data[:cut])
            with pytest.raises(Exception):
                DCIMGFile(q).read_frame(0)


def test_dcimg_corruption_fuzz(tmp_path, rng):
    """Random byte corruption (the TIFF-fuzz contract, tests/test_native.py):
    every mutant either parses to the true frame or raises cleanly —
    never a crash, never a giant allocation from a garbage size field
    (DCIMGFile._validate bounds frames x stride against the file size)."""
    frames = (rng.random((3, 12, 20)) * 1000).astype(np.uint16)
    for fmt in (0x7, 0x2000000):
        p = tmp_path / f"c{fmt:x}.dcimg"
        DCIMGFile.write(p, frames, format_version=fmt)
        data = bytearray(p.read_bytes())
        for i in range(60):
            buf = bytearray(data)
            # bias half the mutations into the headers where size fields
            # live; the rest anywhere
            hi = 0x200 if i % 2 else len(buf)
            for _ in range(4):
                buf[int(rng.integers(0, min(hi, len(buf))))] = int(
                    rng.integers(256))
            q = tmp_path / f"mut{fmt:x}_{i}.dcimg"
            q.write_bytes(bytes(buf))
            try:
                d = DCIMGFile(q)
                assert d.shape[0] * d.shape[1] * d.shape[2] <= 10 * frames.size
                got = d.read_frame(0)
                assert got.shape == d.shape[1:]
            except Exception:  # noqa: BLE001 - clean failure is correct
                continue


def test_dcimg_intermediate_version_rejected(tmp_path, rng):
    """Format versions in [0x1000000, 0x2000000) still fail loudly —
    misparsing would return garbage pixels silently."""
    frames = (rng.random((2, 8, 8)) * 100).astype(np.uint16)
    p = tmp_path / "cam15.dcimg"
    DCIMGFile.write(p, frames)
    raw = bytearray(p.read_bytes())
    import struct as _struct

    _struct.pack_into("<I", raw, 8, 0x1000000)
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="unsupported DCIMG"):
        DCIMGFile(p)


def test_fnt_cubes_and_movie_exports(tmp_path, rng):
    """FNT .nrrd cube cutting (fnt-slice2cube role) and movie rendering
    (ffmpeg role) — reference convert.py:168-247."""
    from ipp_tpu.io.nrrd import read_nrrd
    from ipp_tpu.pipeline.convert import (tif_series_to_fnt,
                                          tif_series_to_movie)

    src = tmp_path / "src"
    src.mkdir()
    vol = (rng.random((5, 70, 90)) * 4000).astype(np.uint16)
    for z in range(5):
        tio.imwrite(src / f"img_{z:06d}.tif", vol[z])
    out = tif_series_to_fnt(src, tmp_path / "fnt", cube=64,
                            voxel_um=(2.0, 1.0, 1.0))
    cubes = sorted(out.rglob("*.nrrd"))
    assert len(cubes) == 4  # 1 z slab x 2 y x 2 x
    blk, hdr = read_nrrd(cubes[0])
    assert blk.shape == (5, 64, 64)
    np.testing.assert_array_equal(blk, vol[:, :64, :64])
    assert "spacings" in hdr

    try:
        movie = tif_series_to_movie(src, tmp_path / "mov.avi", fps=10)
        assert movie.exists() and movie.stat().st_size > 1000
    except RuntimeError as e:
        pytest.skip(f"no video codec in image: {e}")


def test_bdv_export_roundtrip(tmp_path, rng):
    """BigDataViewer XML+HDF5 export (imagemanager BDVVolume role):
    multi-level datasets, XML header, plane read-back."""
    from ipp_tpu.io.bdv import BDVReader, tif_series_to_bdv

    src = tmp_path / "src"
    src.mkdir()
    vol = (rng.random((6, 300, 280)) * 20000).astype(np.uint16)
    for z in range(6):
        tio.imwrite(src / f"img_{z:06d}.tif", vol[z])
    xml = tif_series_to_bdv(src, tmp_path / "bdv.xml",
                            voxel_um=(2.0, 0.4, 0.4), n_resolutions=2)
    assert xml.exists() and xml.with_suffix(".h5").exists()
    txt = xml.read_text()
    assert "bdv.hdf5" in txt and "<size>280 300 6</size>" in txt
    r0 = BDVReader(xml, level=0)
    assert r0.shape == (6, 300, 280)
    np.testing.assert_array_equal(r0[2], vol[2].astype(np.int16))
    r1 = BDVReader(xml, level=1)
    assert r1.shape == (6, 150, 140)
    r0.close()
    r1.close()


def test_precomputed_roundtrip(tmp_path, rng):
    """Neuroglancer precomputed writer: info JSON is spec-shaped, raw
    chunks decode back to the exact volume, mip levels downsample."""
    import json

    from ipp_tpu.io.precomputed import read_precomputed, write_precomputed

    vol = (rng.random((20, 70, 50)) * 60000).astype(np.uint16)
    out = write_precomputed(tmp_path / "pc", iter(vol), vol.shape,
                            np.uint16, voxel_nm=(2000., 1000., 1000.),
                            chunk=(16, 32, 32), n_levels=2)
    info = json.loads((out / "info").read_text())
    assert info["type"] == "image" and info["data_type"] == "uint16"
    assert info["scales"][0]["size"] == [50, 70, 20]  # x, y, z
    assert info["scales"][0]["encoding"] == "raw"
    got = read_precomputed(out, 0)
    np.testing.assert_array_equal(got, vol)
    lv1 = read_precomputed(out, 1)
    assert lv1.shape == (10, 35, 25)
    # level-1 voxels are means of 2x2 in-plane blocks of subsampled planes
    expect = vol[0, :70, :50].reshape(35, 2, 25, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(lv1[0], expect.astype(np.uint16))


def test_precomputed_cli(tmp_path, rng):
    from ipp_tpu.io import tiff as tio
    from ipp_tpu.pipeline.tsv_tools import main

    d = tmp_path / "series"
    d.mkdir()
    for z in range(5):
        tio.imwrite(d / f"img_{z:06d}.tif",
                    (rng.random((40, 40)) * 1000).astype(np.uint16))
    rc = main(["precomputed", "--input", str(d),
               "--output", str(tmp_path / "pc"), "--levels", "2"])
    assert rc == 0
    assert (tmp_path / "pc" / "info").exists()


def test_convert_generic_sources_and_targets(tmp_path, rng):
    """The teraconverter role: any supported source -> TIFF series ->
    pyramid targets, with --halve mean/max (reference
    TeraStitcher/utils/volumeconverter)."""
    from ipp_tpu.io import tiff as tio
    from ipp_tpu.io.raw import raw_imsave
    from ipp_tpu.io.terafly import TeraFlyVolume, tif_series_to_terafly
    from ipp_tpu.pipeline.convert import convert

    vol = (rng.random((4, 64, 64)) * 60000).astype(np.uint16)
    src = tmp_path / "series"
    src.mkdir()
    for z in range(4):
        tio.imwrite(src / f"img_{z:06d}.tif", vol[z])

    # max-halve pyramid: level-1 pixels are maxima of 2x2x2 blocks
    tf_max = tif_series_to_terafly(src, tmp_path / "tf_max", halve="max",
                                   n_resolutions=2)
    lv1 = TeraFlyVolume(tf_max, resolution=1)
    got = lv1[0]
    expect = vol[:2, :64, :64].reshape(2, 32, 2, 32, 2).max(axis=(0, 2, 4))
    np.testing.assert_array_equal(got, expect.astype(np.uint16))

    # TeraFly root as a SOURCE
    out = convert(tf_max, tmp_path / "from_tf")
    outs = sorted(out.glob("img_*.tif"))
    assert len(outs) == 4
    np.testing.assert_array_equal(tio.imread(outs[1]), vol[1])

    # multi-page 3D TIFF as a source
    stack_path = tmp_path / "stack.tif"
    tio.write_tiff_stack(stack_path, vol)
    out = convert(stack_path, tmp_path / "from_stack")
    np.testing.assert_array_equal(
        tio.imread(sorted(out.glob("img_*.tif"))[2]), vol[2])

    # raw series as a source
    raw_dir = tmp_path / "raws"
    raw_dir.mkdir()
    for z in range(4):
        raw_imsave(raw_dir / f"img_{z:06d}.raw", vol[z])
    out = convert(raw_dir, tmp_path / "from_raw")
    np.testing.assert_array_equal(
        tio.imread(sorted(out.glob("img_*.tif"))[3]), vol[3])

    # BDV + precomputed targets from the CLI surface
    out = convert(src, tmp_path / "multi", to_bdv=True, to_precomputed=True)
    assert (tmp_path / "multi_bdv.xml").exists()
    assert (tmp_path / "multi_precomputed" / "info").exists()


def test_bdv_u16_bit_pattern_lossless(tmp_path, rng):
    """BDV int16 datasets hold the unsigned bit pattern: full u16 range
    round-trips exactly through write_bdv -> BDVReader."""
    from ipp_tpu.io import tiff as tio
    from ipp_tpu.io.bdv import BDVReader, tif_series_to_bdv

    vol = np.array([[[0, 1, 30000], [32768, 50000, 65535]]] * 2,
                   np.uint16)  # (2, 2, 3) incl. values beyond int16
    d = tmp_path / "series"
    d.mkdir()
    for z in range(2):
        tio.imwrite(d / f"img_{z:06d}.tif", vol[z])
    xml = tif_series_to_bdv(d, tmp_path / "out.xml", n_resolutions=1)
    r = BDVReader(xml)
    np.testing.assert_array_equal(r[0], vol[0])
    np.testing.assert_array_equal(r[1], vol[1])
    r.close()


def test_all_export_formats_agree_at_level0(tmp_path, rng):
    """Cross-format consistency: the SAME volume written as .ims, BDV,
    TeraFly and neuroglancer precomputed reads back bit-identical at
    level 0 from every format (one dataset, four writers, four
    readers)."""
    from ipp_tpu.io import tiff as tio
    from ipp_tpu.io.bdv import BDVReader, tif_series_to_bdv
    from ipp_tpu.io.ims import ImarisReader, tif_series_to_imaris
    from ipp_tpu.io.precomputed import read_precomputed
    from ipp_tpu.io.terafly import TeraFlyVolume, tif_series_to_terafly
    from ipp_tpu.pipeline.tsv_tools import series_to_precomputed

    vol = rng.integers(0, 65535, (6, 40, 48)).astype(np.uint16)
    src = tmp_path / "src"
    src.mkdir()
    for z in range(vol.shape[0]):
        tio.imwrite(src / f"img_{z:06d}.tif", vol[z])

    tif_series_to_imaris(src, tmp_path / "v.ims", voxel_um=(2, 1, 1))
    with ImarisReader(tmp_path / "v.ims") as r:
        np.testing.assert_array_equal(r[0:len(r)], vol)

    tif_series_to_bdv(src, tmp_path / "v_bdv.xml", voxel_um=(2, 1, 1))
    b = BDVReader(tmp_path / "v_bdv.xml")
    np.testing.assert_array_equal(
        np.stack([b[z] for z in range(len(b))]), vol)

    tif_series_to_terafly(src, tmp_path / "tf", voxel_um=(2, 1, 1))
    t = TeraFlyVolume(tmp_path / "tf")
    np.testing.assert_array_equal(
        np.stack([t[z] for z in range(len(t))]), vol)

    series_to_precomputed(src, tmp_path / "pc",
                          voxel_nm=(2000, 1000, 1000), n_levels=1)
    np.testing.assert_array_equal(read_precomputed(tmp_path / "pc"), vol)


def test_convert_isotropic_downsample_npz(tmp_path, rng):
    """--voxel-size-target during conversion: per-chunk downsampled TIFFs
    in --downsample-dtype plus the atlas-registration npz (reference
    convert.py:122-130 -> parallel_image_processor z_stack + tail)."""
    from ipp_tpu.io import tiff as tio
    from ipp_tpu.pipeline.convert import main as convert_main

    nz, h, w = 8, 40, 32
    vol = (rng.random((nz, h, w)) * 60000).astype(np.uint16)
    src = tmp_path / "series"
    src.mkdir()
    for z in range(nz):
        tio.imwrite(src / f"img_{z:06d}.tif", vol[z])

    out = tmp_path / "conv"
    ds = tmp_path / "ds"
    rc = convert_main([
        "-i", str(src), "-o", str(out),
        "--voxel", "2.0", "1.0", "1.0",        # z y x um
        "--voxel-size-target", "4.0",
        "--downsample-path", str(ds),
        "--downsample-dtype", "uint16",
    ])
    assert rc == 0
    # r_z = 2 -> chunks of 2 planes; r_xy = 4 -> target (10, 8)
    chunk_tifs = sorted(ds.glob("img_*.tif"))
    assert len(chunk_tifs) == nz // 2
    first = tio.imread(chunk_tifs[0])
    assert first.shape == (10, 8) and first.dtype == np.uint16

    npz = np.load(tmp_path / "conv_zyx4.0um.npz", allow_pickle=True)
    assert npz["I"].shape == (4, 10, 8)       # exact final z resize
    axes = npz["xI"]
    assert len(axes) == 3 and len(axes[0]) == 4

    # all-mean default xy rungs (the reference converter's effective
    # default), then the z ladder's first rung is MAX (:252): chunk
    # plane 0 == z-max of the two mean-pooled planes
    pooled = vol[:2].astype(np.float32).reshape(2, 10, 4, 8, 4).mean(
        axis=(2, 4)).max(axis=0)
    from ipp_tpu.ops.intensity import convert_to_16bit

    import jax.numpy as jnp

    expect = np.asarray(convert_to_16bit(jnp.asarray(
        np.maximum(pooled, 0))))
    np.testing.assert_allclose(first.astype(np.float32),
                               expect.astype(np.float32), atol=2.0)


def test_convert_reference_preprocess_flags(tmp_path, rng):
    """The reference converter's preprocessing surface: -dsx/-dsy/-dsm
    2D pre-downsample, --destripe fixed sigma gate, 16-bit conversion,
    -zl/-zm compression (reference convert.py:40-59, 78-80, 319-371)."""
    from ipp_tpu.io import tiff as tio
    from ipp_tpu.ops.resample import block_reduce
    from ipp_tpu.pipeline.convert import main as convert_main

    nz, h, w = 3, 24, 20
    vol = (rng.random((nz, h, w)) * 60000).astype(np.uint16)
    src = tmp_path / "series"
    src.mkdir()
    for z in range(nz):
        tio.imwrite(src / f"img_{z:06d}.tif", vol[z])

    out = tmp_path / "conv"
    rc = convert_main([
        "-i", str(src), "-o", str(out),
        "-dsy", "2", "-dsx", "2", "-dsm", "max", "-zl", "2",
    ])
    assert rc == 0
    got = tio.imread(out / "img_000001.tif")
    expect = np.asarray(block_reduce(vol[1], (2, 2), "max"))
    np.testing.assert_array_equal(got, expect.astype(vol.dtype))

    # --destripe with no sigma given takes the fixed (250, 250)
    import ipp_tpu.pipeline.convert as conv_mod

    seen = {}
    orig = conv_mod.convert

    def spy(*a, **k):
        seen["cfg"] = a[2] if len(a) > 2 else k.get("cfg")
        return orig(*a, **k)

    conv_mod.convert = spy
    try:
        rc = convert_main(["-i", str(src), "-o", str(tmp_path / "c2"),
                           "--destripe", "--convert-to-16bit"])
    finally:
        conv_mod.convert = orig
    assert rc == 0
    assert seen["cfg"].sigma == (250.0, 250.0)
    assert seen["cfg"].convert_to_16bit


def test_convert_downsample_resume_parity(tmp_path, rng):
    """ADVICE r3: a resumed conversion with a shape-changing cfg (rotate 90
    on non-square planes) must derive the fun-induced voxel correction from
    the TRUE source shape, so its downsample output matches a fresh run;
    and chunks whose reduced TIFF + member planes already exist are skipped,
    not recomputed (reference parallel_image_processor.py:281-290)."""
    from ipp_tpu.io import tiff as tio
    from ipp_tpu.ops.process import ProcessConfig
    from ipp_tpu.pipeline.convert import convert

    nz, h, w = 6, 40, 24  # non-square: rotate swaps the axes
    vol = (rng.random((nz, h, w)) * 60000).astype(np.uint16)
    src = tmp_path / "series"
    src.mkdir()
    for z in range(nz):
        tio.imwrite(src / f"img_{z:06d}.tif", vol[z])
    cfg = ProcessConfig(rotate=90)
    kw = dict(cfg=cfg, voxel_um=(2.0, 1.0, 1.0), target_voxel_um=4.0,
              downsample_dtype="uint16")

    fresh = tmp_path / "fresh"
    convert(src, fresh, downsample_path=tmp_path / "fresh_ds", **kw)
    fresh_npz = np.load(tmp_path / "fresh_zyx4.0um.npz", allow_pickle=True)

    # resumed run: planes pre-written (as if a prior run died after the
    # plane writes), chunk TIFFs and npz missing
    resumed = tmp_path / "resumed"
    resumed.mkdir()
    for z in range(nz):
        tio.imwrite(resumed / f"img_{z:06d}.tif", np.rot90(vol[z]))
    convert(src, resumed, downsample_path=tmp_path / "res_ds",
            resume=True, **kw)
    res_npz = np.load(tmp_path / "resumed_zyx4.0um.npz", allow_pickle=True)
    np.testing.assert_array_equal(res_npz["I"], fresh_npz["I"])
    for a, b in zip(fresh_npz["xI"], res_npz["xI"]):
        np.testing.assert_allclose(a, b)

    # chunk-skip: resume again with everything present — chunk TIFFs must
    # not be rewritten (mtimes unchanged) but the npz must still assemble
    mtimes = {p.name: p.stat().st_mtime_ns
              for p in (tmp_path / "res_ds").glob("img_*.tif")}
    assert mtimes
    (tmp_path / "resumed_zyx4.0um.npz").unlink()
    convert(src, resumed, downsample_path=tmp_path / "res_ds",
            resume=True, **kw)
    for p in (tmp_path / "res_ds").glob("img_*.tif"):
        assert p.stat().st_mtime_ns == mtimes[p.name], p.name
    res2 = np.load(tmp_path / "resumed_zyx4.0um.npz", allow_pickle=True)
    np.testing.assert_array_equal(res2["I"], fresh_npz["I"])
