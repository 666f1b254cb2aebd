"""Codecs and dataset IO."""

from . import dcimg, ims, nrrd, raw, terafly, tiff  # noqa: F401
