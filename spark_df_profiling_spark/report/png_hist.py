"""Data-URI PNG mini-histograms, dependency-free.

The reference embeds matplotlib-rendered ``data:image/png;base64``
mini-histograms in each numeric/date row (``base.py::mini_histogram``/
``create_hist_data``, SURVEY §2.3 N12-N13 ≈L80-170).  matplotlib is not
in this container, so this module hand-writes the PNG instead — stdlib
``zlib``/``struct``/``base64`` only, fully deterministic (no font
rendering, no antialiasing), which also makes the output byte-stable
across hosts in a way matplotlib never was.

Engine stays presentation-free: input is the bin-count array the
profile already computes; all drawing happens report-side.
"""

from __future__ import annotations

import base64
import struct
import zlib

BAR_RGBA = (0x33, 0x7A, 0xB7, 0xFF)  # reference bootstrap blue #337ab7
TRANSPARENT = b"\x00\x00\x00\x00"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def render_png(counts: list[int], height: int = 60, bar_width: int = 14,
               gap: int = 2, color: tuple[int, int, int, int] = BAR_RGBA,
               ) -> bytes:
    """RGBA PNG of a bar chart: one bar per bin, transparent background.

    Bars scale to the tallest bin; any non-zero bin draws at least one
    pixel row (a 1-row bar beats an invisible one for outlier bins).
    """
    if not counts:
        raise ValueError("counts must be non-empty")
    if min(counts) < 0:
        raise ValueError(f"counts must be >= 0: {counts}")
    n = len(counts)
    width = n * bar_width + (n - 1) * gap
    peak = max(counts) or 1
    heights = [min(height, max(1, round(height * c / peak))) if c else 0
               for c in counts]
    bar_px = bytes(color) * bar_width
    off_px = TRANSPARENT * bar_width
    gap_px = TRANSPARENT * gap
    scanlines = bytearray()
    for y in range(height):  # top -> bottom
        scanlines += b"\x00"  # filter type 0 (None) per scanline
        for i in range(n):
            scanlines += bar_px if (height - y) <= heights[i] else off_px
            if i < n - 1:
                scanlines += gap_px
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(scanlines), 9))
            + _chunk(b"IEND", b""))


def png_data_uri(counts: list[int], **kwargs) -> str:
    """``data:image/png;base64,...`` string for an ``<img src=...>``."""
    return ("data:image/png;base64,"
            + base64.b64encode(render_png(counts, **kwargs)).decode("ascii"))
