"""Inter-channel rigid alignment + RGB compositing.

Re-design of the reference's channel alignment (align_images.py:1-754 and
process_images.py:788-908):

- per-axis translation estimated by ECC maximization on Sobel gradients of
  central orthogonal slices (get_gradient/get_transformation_matrix,
  process_images.py:788-818) — cv2 is host-side, tiny inputs;
- iterative integer roll-pad moves until convergence or a cycle
  (align_images.py:137-181, 424-502);
- composite RGB TIFF series writer (merge_all_channels,
  process_images.py:860-1000).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from ..io import tiff as tio
from ..utils.log import Logger

__all__ = ["get_offsets_ecc", "align_volumes", "write_composite_series"]


def _central_slices(vol: np.ndarray, thickness: int = 16):
    """MIP-like central orthogonal sections (reference get_offsets,
    align_images.py:183-240)."""
    d, h, w = vol.shape
    cz, cy, cx = d // 2, h // 2, w // 2
    t = thickness // 2
    xy = vol[max(0, cz - t):cz + t].max(axis=0)
    xz = vol[:, max(0, cy - t):cy + t, :].max(axis=1)
    yz = vol[:, :, max(0, cx - t):cx + t].max(axis=2)
    return xy, xz, yz


def _ecc_translation(ref: np.ndarray, mov: np.ndarray) -> Tuple[float, float]:
    """Translation (dy, dx) aligning mov to ref via ECC on Sobel gradients
    (reference get_transformation_matrix, process_images.py:788-818).
    Falls back to phase correlation when ECC fails to converge."""
    import cv2

    def grad(img):
        img = img.astype(np.float32)
        gx = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3)
        gy = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3)
        return cv2.magnitude(gx, gy)

    g_ref, g_mov = grad(ref), grad(mov)
    warp = np.eye(2, 3, dtype=np.float32)
    criteria = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 100, 1e-6)
    try:
        _, warp = cv2.findTransformECC(g_ref, g_mov, warp,
                                       cv2.MOTION_TRANSLATION, criteria)
        return float(warp[1, 2]), float(warp[0, 2])
    except cv2.error:
        shift, _ = cv2.phaseCorrelate(g_ref, g_mov)
        return float(shift[1]), float(shift[0])


def get_offsets_ecc(ref_vol: np.ndarray, mov_vol: np.ndarray
                    ) -> Tuple[int, int, int]:
    """Integer (dz, dy, dx) to roll mov_vol onto ref_vol: each axis is
    estimated from the two orthogonal sections containing it and averaged
    (reference get_offsets, align_images.py:183-240)."""
    xy_r, xz_r, yz_r = _central_slices(ref_vol)
    xy_m, xz_m, yz_m = _central_slices(mov_vol)
    dy1, dx1 = _ecc_translation(xy_r, xy_m)
    dz1, dx2 = _ecc_translation(xz_r, xz_m)
    dz2, dy2 = _ecc_translation(yz_r, yz_m)
    dz = int(round((dz1 + dz2) / 2.0))
    dy = int(round((dy1 + dy2) / 2.0))
    dx = int(round((dx1 + dx2) / 2.0))
    return dz, dy, dx


def roll_pad(vol: np.ndarray, shift: Tuple[int, int, int]) -> np.ndarray:
    """Integer shift with zero fill (reference roll_pad,
    align_images.py:137-181)."""
    out = vol
    for ax, s in enumerate(shift):
        if s == 0:
            continue
        out = np.roll(out, s, axis=ax)
        sl = [slice(None)] * out.ndim
        if s > 0:
            sl[ax] = slice(0, s)
        else:
            sl[ax] = slice(out.shape[ax] + s, out.shape[ax])
        out[tuple(sl)] = 0
    return out


def align_volumes(ref_vol: np.ndarray, mov_vol: np.ndarray,
                  max_iter: int = 10, log: Optional[Logger] = None
                  ) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """Iterate roll-pad moves until convergence or a cycle
    (reference align_images, align_images.py:424-502)."""
    log = log or Logger()
    total = np.zeros(3, int)
    seen = set()
    mov = mov_vol.copy()
    for it in range(max_iter):
        dz, dy, dx = get_offsets_ecc(ref_vol, mov)
        # ECC returns the warp taking ref toward mov; roll mov back
        move = (-dz, -dy, -dx)
        if move == (0, 0, 0):
            break
        key = tuple(total + move)
        if key in seen:
            break
        seen.add(tuple(total))
        mov = roll_pad(mov, move)
        total += move
    log.info(f"channel alignment offsets (dz, dy, dx) = {tuple(total)}")
    return mov, tuple(int(v) for v in total)


def write_composite_series(
    channels: Dict[str, Path],
    colors: Dict[str, str],
    out_dir: Path,
    offsets: Optional[Dict[str, Tuple[int, int, int]]] = None,
    dtype=np.uint8,
    log: Optional[Logger] = None,
) -> Path:
    """Merge per-channel TIFF series into RGB composites, applying integer
    offsets (reference merge_all_channels / generate_composite_image,
    process_images.py:860-1000)."""
    log = log or Logger()
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    offsets = offsets or {}
    files = {ch: sorted(Path(p).glob("*.tif")) for ch, p in channels.items()}
    depth = min(len(f) for f in files.values())
    color_idx = {"r": 0, "g": 1, "b": 2}
    info = np.iinfo(dtype)
    for z in range(depth):
        composite = None
        for ch, flist in files.items():
            dz, dy, dx = offsets.get(ch, (0, 0, 0))
            zz = z - dz
            if not 0 <= zz < len(flist):
                continue
            img = tio.imread(flist[zz]).astype(np.float32)
            if dy or dx:
                img = roll_pad(img[None], (0, dy, dx))[0]
            if composite is None:
                composite = np.zeros(img.shape + (3,), np.float32)
            composite[..., color_idx[colors.get(ch, "g")]] += img
        out = np.clip(composite, info.min, info.max).astype(dtype)
        tio.imwrite(out_dir / f"composite_{z:06d}.tif", out)
    log.info(f"{depth} composite planes written to {out_dir}")
    return out_dir
