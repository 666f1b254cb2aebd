"""FNT cube deconvolution — the fnt_cube_processor equivalent.

(reference fnt_cube_processor.py:30-388: deconvolve FNT .nrrd cubes with
pycudadecon GPU RL, PSF from the LsDeconv optics model, padding to
2,3,5,7-smooth FFT dims, optional destriping, GPU semaphore queue.)

Here: cubes stream through the batched TPU RL kernel; the PSF comes from
ipp_tpu.ops.psf.make_psf; FFT dims are already smooth via fft_shape_for.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..io.nrrd import read_nrrd, write_nrrd
from ..ops.deconv import fft_shape_for, richardson_lucy
from ..ops.destripe import filter_streaks
from ..ops.psf import make_psf
from ..utils.jaxconfig import enable_persistent_cache
from ..utils.log import Logger
from ..utils.progress import ProgressReporter

__all__ = ["process_cubes", "main"]


def process_cubes(
    input_dir,
    output_dir,
    voxel_um: Tuple[float, float, float] = (1.0, 0.4, 0.4),
    na: float = 0.4,
    refractive_index: float = 1.45,
    lambda_ex: float = 488.0,
    lambda_em: float = 525.0,
    niter: int = 10,
    destripe_sigma: float = 0.0,
    dark: float = 0.0,
    resume: bool = False,
    log: Optional[Logger] = None,
) -> int:
    enable_persistent_cache()
    import jax.numpy as jnp

    log = log or Logger()
    input_dir = Path(input_dir)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    cubes = sorted(input_dir.rglob("*.nrrd"))
    if not cubes:
        raise FileNotFoundError(f"no .nrrd cubes under {input_dir}")
    # sample at the cube's own voxel pitch: our RL convolves the PSF
    # directly on the data grid, which is what pycudadecon's internal
    # OTF-to-data-grid resampling achieves for the reference
    # (fnt_cube_processor.py:201-222 passes dxpsf separately from dxdata)
    psf, fwhm_xy, fwhm_z = make_psf(
        dxy=voxel_um[1] * 1000.0, dz=voxel_um[0] * 1000.0, NA=na,
        n=refractive_index, lambda_ex=lambda_ex, lambda_em=lambda_em,
        sample_at_data_pitch=True)
    psf_zyx = np.transpose(psf, (2, 1, 0))
    log.info(f"PSF {psf_zyx.shape}, FWHM xy {fwhm_xy:.0f} nm z {fwhm_z:.0f} nm")
    prog = ProgressReporter(len(cubes), desc="cubes")
    done = 0
    for cube_path in cubes:
        out_path = output_dir / cube_path.relative_to(input_dir)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        if resume and out_path.exists():
            prog.step()
            continue
        vol, header = read_nrrd(cube_path)
        in_dtype = vol.dtype
        x = jnp.asarray(vol, jnp.float32)
        if dark > 0:
            x = jnp.maximum(x - dark, 0.0)
        if destripe_sigma > 0:
            x = jnp.asarray(np.stack([
                np.asarray(filter_streaks(np.asarray(x[z]),
                                          sigma=(destripe_sigma,) * 2))
                for z in range(x.shape[0])]))
        fft_shape = fft_shape_for(x.shape, psf_zyx.shape)
        dec = richardson_lucy(x, jnp.asarray(psf_zyx), niter=niter,
                              fft_shape=fft_shape)
        dec = np.asarray(dec)
        if np.issubdtype(in_dtype, np.integer):
            info = np.iinfo(in_dtype)
            dec = np.clip(np.rint(dec), info.min, info.max)
        write_nrrd(out_path, dec.astype(in_dtype), extra_header={
            k: v for k, v in header.items()
            if k in ("space", "space directions", "space origin")})
        done += 1
        prog.step()
    prog.close()
    return done


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="deconvolve FNT .nrrd cubes")
    p.add_argument("--input", "-i", required=True, type=Path)
    p.add_argument("--output", "-o", required=True, type=Path)
    p.add_argument("--voxel", type=float, nargs=3, default=(1.0, 0.4, 0.4),
                   metavar=("Z", "Y", "X"))
    p.add_argument("--na", type=float, default=0.4)
    p.add_argument("--niter", type=int, default=10)
    p.add_argument("--dark", type=float, default=0.0)
    p.add_argument("--destripe-sigma", type=float, default=0.0)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)
    process_cubes(args.input, args.output, tuple(args.voxel), na=args.na,
                  niter=args.niter, dark=args.dark,
                  destripe_sigma=args.destripe_sigma, resume=args.resume)
    return 0


if __name__ == "__main__":
    sys.exit(main())
