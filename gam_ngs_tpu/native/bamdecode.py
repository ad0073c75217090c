"""Adapter: native gamio decoder -> io.bam table types."""

from __future__ import annotations

from .loader import native_available, read_bam_native


def available() -> bool:
    return native_available()


def decode_file(path: str):
    res = read_bam_native(path)
    if res is None:
        raise ImportError("native gamio library unavailable")
    text, names, lengths, cols = res
    from ..io.bam import AlignmentTable, BamHeader

    return BamHeader(text, names, lengths), AlignmentTable(**cols)
