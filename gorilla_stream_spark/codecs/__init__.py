"""Codec registry: self-describing buffers with a 1-byte codec id prefix.

Decode needs no options — the format is self-describing, matching the
reference's header-flag dispatch (``/root/reference/c_src/
gorilla_nif.cpp:1417-1425``).
"""

from __future__ import annotations

import numpy as np

from gorilla_stream_spark.codecs import floatcodecs, fsst, intcodecs

RAW, FOR, RLE, DICT, DELTA, DOD, FSST, GXOR, PAGED = range(9)

CODEC_NAMES = {
    RAW: "raw",
    FOR: "for",
    RLE: "rle",
    DICT: "dict",
    DELTA: "delta",
    DOD: "dod",
    FSST: "fsst",
    GXOR: "gxor",
    PAGED: "paged",
}
CODEC_IDS = {v: k for k, v in CODEC_NAMES.items()}

INT_ENCODERS = {
    RAW: intcodecs.raw_encode,
    FOR: intcodecs.for_encode,
    RLE: intcodecs.rle_encode,
    DICT: intcodecs.dict_encode,
    DELTA: intcodecs.delta_encode,
    DOD: intcodecs.dod_encode,
    FSST: fsst.fsst_encode,
}
DECODERS = {
    RAW: intcodecs.raw_decode,
    FOR: intcodecs.for_decode,
    RLE: intcodecs.rle_decode,
    DICT: intcodecs.dict_decode,
    DELTA: intcodecs.delta_decode,
    DOD: intcodecs.dod_decode,
    FSST: fsst.fsst_decode,
    GXOR: floatcodecs.gxor_decode,
}


def encode_array(a: np.ndarray, codec: str = "auto", **kwargs) -> bytes:
    """Encode an int64 array (or float64 for 'gxor') into a framed buffer."""
    if codec == "auto":
        from gorilla_stream_spark.selector import select_codec

        codec = select_codec(a)
    cid = CODEC_IDS[codec]
    if cid == GXOR:
        body = floatcodecs.gxor_encode(a)
    else:
        body = INT_ENCODERS[cid](a, **kwargs) if cid == FSST else INT_ENCODERS[cid](a)
    return bytes([cid]) + body


def encode_paged(
    a: np.ndarray, codec: str = "auto", page_tokens: int = 1 << 16
) -> tuple[bytes, str]:
    """Encode an array as independently-coded pages (Parquet-page analog).

    Codec selection happens per page, so a block mixing heterogeneous docs
    (post-shuffle) still compresses each homogeneous stretch optimally —
    the scale-robust answer to per-block selection being too coarse.
    Returns (framed buffer, majority codec name).
    """
    import struct as _struct

    n = a.size
    if n <= page_tokens:
        buf = encode_array(a, codec=codec)
        return buf, CODEC_NAMES[buf[0]]
    bufs = [encode_array(a[i : i + page_tokens], codec=codec) for i in range(0, n, page_tokens)]
    names = [CODEC_NAMES[b[0]] for b in bufs]
    majority = max(set(names), key=names.count)
    head = bytes([PAGED]) + _struct.pack("<II", len(bufs), page_tokens)
    directory = b"".join(_struct.pack("<I", len(b)) for b in bufs)
    return head + directory + b"".join(bufs), majority


def decode_array(buf: bytes | memoryview) -> np.ndarray:
    """Decode any framed buffer (dispatches on the codec id byte)."""
    import struct as _struct

    mv = memoryview(buf)
    cid = mv[0]
    if cid == PAGED:
        npages, _page_tokens = _struct.unpack_from("<II", mv, 1)
        off = 9 + 4 * npages
        lens = _struct.unpack_from(f"<{npages}I", mv, 9)
        parts = []
        for ln in lens:
            parts.append(decode_array(mv[off : off + ln]))
            off += ln
        return np.concatenate(parts)
    return DECODERS[cid](mv[1:])


def codec_of(buf: bytes | memoryview) -> str:
    return CODEC_NAMES[memoryview(buf)[0]]
