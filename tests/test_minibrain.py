"""The 3-channel mini-brain run (SURVEY §7 config 5, VERDICT r3 item 3):
ONE process_images invocation drives preprocess (destripe) -> stitch
steps 1-6 -> downsampled npz -> TeraFly + Imaris + RGB composite for
three channels, every artifact is asserted, and the stitched output is
cross-checked against the reference's own runnable merge path (tsv
TSVVolume reading OUR placement XML, via tests/refshims)."""

import sys
from pathlib import Path

import numpy as np
import pytest

from ipp_tpu.io import tiff as tio
from tests.synth import cut_tiles, make_phantom, write_tile_grid

REF = Path("/root/reference")

CHANNELS = ("Ex_488_Em_525", "Ex_561_Em_600", "Ex_642_Em_690")


@pytest.fixture(scope="module")
def minibrain_run(tmp_path_factory):
    from ipp_tpu.pipeline.process_images import main

    rng = np.random.default_rng(5)
    tmp_path = tmp_path_factory.mktemp("minibrain")
    nz = 6
    vol = make_phantom(rng, (nz, 200, 200), smooth=6.0)
    for ci, ch in enumerate(CHANNELS):
        chvol = vol * (0.5 + 0.25 * ci)
        # vertical stripes for the destripe stage to remove
        stripes = 1.0 + 0.25 * np.sin(
            np.arange(chvol.shape[2]) / (3.0 + ci))[None, None, :]
        tiles, _ = cut_tiles(chvol * stripes, 2, 2, (120, 120), 48,
                             jitter=2, rng=np.random.default_rng(7))
        ch_dir = tmp_path / "raw" / ch
        ch_dir.mkdir(parents=True)
        write_tile_grid(ch_dir, tiles, overlap_nominal_px=48,
                        voxel_um=(0.41, 0.41, 0.2))
    rc = main([
        "--input", str(tmp_path / "raw"),
        "--preprocessed", str(tmp_path / "pre"),
        "--stitched", str(tmp_path / "stitched"),
        "--objective", "15x",
        "--sigma1", "24", "--sigma2", "24", "--wavelet", "db3",
        "--search-radius", "6", "--subvol-dim", "6",
        "--downsampled-voxel", "4.0",
        "--imaris", "--terafly", "--rgb-composite",
    ])
    assert rc == 0
    return tmp_path, nz


def test_minibrain_artifacts(minibrain_run):
    """Every artifact of the full run exists: preprocessed tiles,
    stitched series, placement XML, npz, .ims, TeraFly pyramid per
    channel, and the RGB composite."""
    tmp_path, nz = minibrain_run
    st = tmp_path / "stitched"
    for ch in CHANNELS:
        pre_tiles = list((tmp_path / "pre" / ch).rglob("*.tif"))
        assert len(pre_tiles) == 4 * nz, ch  # 2x2 grid fully preprocessed
        planes = sorted((st / ch).glob("img_*.tif"))
        assert len(planes) == nz, ch
        assert tio.imread(planes[0]).dtype == np.uint16
        assert (st / f"{ch}_placement.xml").exists()
        assert (st / f"{ch}.ims").exists()
        tf = st / f"{ch}_terafly"
        assert list(tf.glob("RES(*)")), ch
        npzs = list(st.glob(f"{ch}_zyx*.npz"))
        assert npzs, ch
        d = np.load(npzs[0], allow_pickle=True)
        assert d["I"].ndim == 3 and len(d["xI"]) == 3
    comps = sorted((st / "composite").glob("*.tif"))
    assert len(comps) == nz
    img = tio.imread(comps[0])
    assert img.ndim == 3 and img.shape[2] == 3
    # all three of r (642), g (561), b (488) are populated
    assert all(img[..., c].max() > 0 for c in range(3))


def test_minibrain_destripe_applied(minibrain_run):
    """The preprocessed tiles have less stripe power than the raw tiles
    (the preprocess stage genuinely ran, not a copy-through)."""
    tmp_path, _ = minibrain_run

    def stripe_power(img):
        col = img.astype(np.float64).mean(axis=0)
        from scipy.ndimage import uniform_filter1d

        return np.abs(col - uniform_filter1d(col, 25)).mean()

    raws = sorted((tmp_path / "raw" / CHANNELS[0]).rglob("*.tif"))
    pres = sorted((tmp_path / "pre" / CHANNELS[0]).rglob("*.tif"))
    raw_p = np.mean([stripe_power(tio.imread(p)) for p in raws[:4]])
    pre_p = np.mean([stripe_power(tio.imread(p)) for p in pres[:4]])
    assert pre_p < raw_p * 0.6, (raw_p, pre_p)


@pytest.mark.skipif(not (REF / "tsv" / "volume.py").exists(),
                    reason="reference tsv unavailable")
@pytest.mark.filterwarnings("ignore::RuntimeWarning")  # reference f16 divide
def test_minibrain_stitched_matches_reference_merge(minibrain_run):
    """The stitched planes of the green channel match the reference's own
    TSV merge (tsv/volume.py run verbatim) fed OUR placement XML over OUR
    preprocessed tiles — the end-to-end cross-check of steps 5+6."""
    tmp_path, nz = minibrain_run
    if "tsv.volume" not in sys.modules:
        from tests.refshims import load_pystripe_core

        load_pystripe_core()
        if str(REF) not in sys.path:
            sys.path.insert(0, str(REF))
    import tsv.volume as tv

    ch = CHANNELS[1]
    xml = tmp_path / "stitched" / f"{ch}_placement.xml"
    # the pipeline default is MAX blending (reference process_images
    # default, docs/DEVIATIONS.md has none here) — mirror it
    ref_vol = tv.TSVVolume(str(xml), cosine_blending=False)
    bbox = ref_vol.volume
    for z in (0, nz - 1):
        ref_plane = ref_vol.imread(
            tv.VExtent(bbox.x0, bbox.x1, bbox.y0, bbox.y1, z, z + 1),
            np.float32)[0]
        ours = tio.imread(
            tmp_path / "stitched" / ch / f"img_{z:06d}.tif")
        # bound = the reference's own f16 accumulation rounding + our u16
        # plane quantization (see test_golden_tsv_merge for the derivation)
        np.testing.assert_allclose(ours.astype(np.float32), ref_plane,
                                   atol=4.5, rtol=4e-3)
