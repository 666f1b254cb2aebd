"""Hamamatsu DCIMG reader (v1.0 session layout).

Replaces the reference's dcimg dependency (pystripe/core.py DCIMGFile use)
and mirrors the format handling of the TeraStitcher dcimg ioplugin
(src/iomanager/plugins/dcimg/dcimg.cpp:100-290):

- file header: magic 'DCIMG', format_version u32 @8, nsess u32 @32,
  nfrms u32 @36, header_size u32 @40;
- session header at `header_size`: session_size u64, 6 reserved u32,
  nfrms u32, byte_depth u32, reserved, xsize u32, bytes_per_row u32,
  ysize u32;
- frame pixel data packed contiguously from byte offset 232;
- camera quirk: the first 4 pixels of each frame's first row hold metadata
  and are replaced with the pixels below them (dcimg.cpp:271-273).
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Union

import numpy as np

__all__ = ["DCIMGFile", "dcimg_imread"]


class DCIMGFile:
    def __init__(self, path: Union[str, Path]):
        self.path = Path(path)
        with open(self.path, "rb") as f:
            head = f.read(44)
            if head[:5] != b"DCIMG":
                raise ValueError(f"not a DCIMG file: {self.path}")
            self.format_version = struct.unpack_from("<I", head, 8)[0]
            if self.format_version >= 0x1000000:
                # DCAM-API 4+ session layouts differ; misparsing them
                # would return garbage pixels silently — fail loudly
                # (the reference's own plugin reads only this older
                # layout too, dcimg.cpp:100-290)
                raise ValueError(
                    f"unsupported DCIMG format version "
                    f"0x{self.format_version:x} in {self.path}; only the "
                    "contiguous-session layout (version < 0x1000000) is "
                    "implemented")
            self.nsess = struct.unpack_from("<I", head, 32)[0]
            self.nfrms = struct.unpack_from("<I", head, 36)[0]
            header_size = struct.unpack_from("<I", head, 40)[0]
            f.seek(header_size)
            sess = f.read(64)
            (self.session_size,) = struct.unpack_from("<Q", sess, 0)
            nfrms2, byte_depth, _r, xsize, bytes_per_row, ysize = (
                struct.unpack_from("<6I", sess, 32))
            self.byte_depth = byte_depth
            self.xsize = xsize
            self.ysize = ysize
            self.bytes_per_row = bytes_per_row
        # the TeraStitcher plugin maps width=ysize, height=xsize
        self.shape = (self.nfrms, self.xsize, self.ysize)
        self.dtype = np.uint16 if self.byte_depth == 2 else np.uint8
        self._data_offset = 232

    def read_frame(self, z: int) -> np.ndarray:
        nfrms, h, w = self.shape
        if not 0 <= z < nfrms:
            raise IndexError(z)
        frame_bytes = h * w * self.byte_depth
        with open(self.path, "rb") as f:
            f.seek(self._data_offset + z * frame_bytes)
            raw = f.read(frame_bytes)
        img = np.frombuffer(raw, dtype=self.dtype).reshape(h, w).copy()
        # metadata-pixel fixup (dcimg.cpp:271-273)
        if h > 1:
            img[0, :4] = img[1, :4]
        return img

    def __getitem__(self, z):
        if isinstance(z, slice):
            return np.stack([self.read_frame(i)
                             for i in range(*z.indices(self.shape[0]))])
        return self.read_frame(z)

    def __len__(self):
        return self.shape[0]

    @staticmethod
    def write(path: Union[str, Path], frames: np.ndarray) -> None:
        """Write a DCIMG v1.0 container (for tests / interop checks)."""
        frames = np.asarray(frames)
        assert frames.ndim == 3
        nfrms, h, w = frames.shape
        byte_depth = frames.dtype.itemsize
        header_size = 100
        with open(path, "wb") as f:
            head = bytearray(header_size)
            head[:5] = b"DCIMG"
            struct.pack_into("<I", head, 8, 0x7)
            struct.pack_into("<I", head, 32, 1)        # nsess
            struct.pack_into("<I", head, 36, nfrms)
            struct.pack_into("<I", head, 40, header_size)
            f.write(head)
            sess = bytearray(232 - header_size)
            struct.pack_into("<Q", sess, 0, len(sess))
            struct.pack_into("<6I", sess, 32, nfrms, byte_depth, 0,
                             h, w * byte_depth, w)
            f.write(sess)
            f.write(np.ascontiguousarray(frames).tobytes())


def dcimg_imread(path: Union[str, Path], z: int = 0) -> np.ndarray:
    return DCIMGFile(path).read_frame(z)
