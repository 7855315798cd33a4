"""Vectorized bit packing/unpacking primitives.

The reference implements MSB-first bit streams with a byte-flushing
BitWriter/BitReader (``/root/reference/lib/gorilla_stream/compression/encoder/
bit_writer.ex:18-49``, C++ ``c_src/gorilla_nif.cpp:96-211``).  Here every
value crosses the JVM<->Python boundary in Arrow batches and is packed with
numpy's C kernels — no per-value Python.  Layout is MSB-first big-endian like
the reference (``gorilla_nif.cpp:69-81``).

Core trick: a value of bit-width ``w`` is materialized as the last ``w``
columns of its 64-bit big-endian ``np.unpackbits`` matrix; ``np.packbits`` of
the flattened matrix yields the byte stream.  Cost is O(n*w) byte temporaries,
bounded by the Arrow batch size.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "bit_width",
    "max_bit_width",
    "pack",
    "unpack",
    "zigzag",
    "unzigzag",
    "check_count",
    "MAX_COUNT",
]

# Sanity ceiling on header-declared element counts.  Legitimate blocks are
# bounded by the engine's block_tokens (~1M); a corrupted count byte must
# raise, not allocate (a width-0 stream consumes zero payload bytes, so the
# buffer length alone cannot validate the count).
MAX_COUNT = 1 << 28


def check_count(n: int) -> int:
    if not 0 <= n <= MAX_COUNT:
        raise ValueError(f"implausible element count {n} (max {MAX_COUNT})")
    return n


def bit_width(value: int) -> int:
    """Bits needed to represent the non-negative int ``value`` (0 -> 0)."""
    return int(value).bit_length()


def max_bit_width(values: np.ndarray) -> int:
    """Bit width of the max of a non-negative integer array (empty -> 0)."""
    if values.size == 0:
        return 0
    return bit_width(int(values.max()))


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative ints into an MSB-first bitstream at fixed ``width``.

    ``values`` may be any unsigned-representable integer dtype; every value
    must be < 2**width.  width == 0 encodes a run of zeros as zero bytes.

    Word-wise layout trick: every group of 8 values occupies exactly
    ``width`` output bytes, so the stream is built as a (groups, width) byte
    matrix with 8 vectorized shift-and-OR passes (one per lane) instead of a
    (n, 64) bit matrix — O(n*width/8) byte traffic, not O(64n).
    """
    n = values.size
    if n == 0 or width == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if width == 64:
        return v.astype(">u8").tobytes()
    if width & 7 == 0:
        # byte-multiple widths: each value is exactly the trailing width/8
        # bytes of its 8-byte big-endian form — one pass, no lane loop
        nb = width >> 3
        return np.ascontiguousarray(
            v.astype(">u8").view(np.uint8).reshape(n, 8)[:, 8 - nb :]
        ).tobytes()
    ngroups = (n + 7) >> 3
    if ngroups << 3 != n:
        v = np.concatenate([v, np.zeros((ngroups << 3) - n, dtype=np.uint64)])
    v = v.reshape(ngroups, 8)
    out = np.zeros((ngroups, width), dtype=np.uint8)
    for lane in range(8):
        bitpos = lane * width
        b0 = bitpos >> 3
        nbits = (bitpos & 7) + width  # window bits from the start of byte b0
        nbytes = (nbits + 7) >> 3
        col = v[:, lane]
        if nbytes <= 8:
            shifted = col << np.uint64((nbytes << 3) - nbits)
            win = shifted.astype(">u8").view(np.uint8).reshape(ngroups, 8)
            out[:, b0 : b0 + nbytes] |= win[:, 8 - nbytes :]
        else:  # nbytes == 9: split into an 8-byte-aligned head + low-bit tail
            lowb = np.uint64(nbits - 64)
            hi = col >> lowb  # exactly fills bits (bitpos&7)..64 of the window
            out[:, b0 : b0 + 8] |= hi.astype(">u8").view(np.uint8).reshape(ngroups, 8)
            lo = col & ((np.uint64(1) << lowb) - np.uint64(1))
            out[:, b0 + 8] |= (lo << (np.uint64(8) - lowb)).astype(np.uint8)
    return out.tobytes()[: (n * width + 7) >> 3]


def unpack(buf: bytes | np.ndarray, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack` — returns ``n`` uint64 values."""
    check_count(n)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    nbytes = (n * width + 7) >> 3
    if isinstance(buf, (bytes, bytearray, memoryview)):
        raw = np.frombuffer(buf, dtype=np.uint8, count=nbytes)
    else:
        raw = np.asarray(buf, dtype=np.uint8)[:nbytes]
        if raw.size < nbytes:
            # match the bytes path: a short ndarray must raise, not
            # zero-fill the missing payload into silent corruption
            raise ValueError(f"unpack: buffer has {raw.size} bytes, need {nbytes}")
    if width == 64:
        return raw.view(">u8").astype(np.uint64)
    if width & 7 == 0:
        # inverse of the byte-multiple fast path: left-pad each value's
        # width/8 bytes back to 8-byte big-endian words
        nb = width >> 3
        mat8 = np.zeros((n, 8), dtype=np.uint8)
        mat8[:, 8 - nb :] = raw.reshape(n, nb)
        return mat8.view(">u8").ravel().astype(np.uint64)
    ngroups = (n + 7) >> 3
    mat = np.zeros(ngroups * width, dtype=np.uint8)
    mat[: raw.size] = raw
    mat = mat.reshape(ngroups, width)
    out = np.empty((ngroups, 8), dtype=np.uint64)
    vmask = (np.uint64(1) << np.uint64(width)) - np.uint64(1)
    for lane in range(8):
        bitpos = lane * width
        b0 = bitpos >> 3
        nbits = (bitpos & 7) + width
        nbytes = (nbits + 7) >> 3
        if nbytes <= 8:
            win = np.zeros((ngroups, 8), dtype=np.uint8)
            win[:, 8 - nbytes :] = mat[:, b0 : b0 + nbytes]
            vals = np.ascontiguousarray(win).view(">u8").ravel().astype(np.uint64)
            out[:, lane] = (vals >> np.uint64((nbytes << 3) - nbits)) & vmask
        else:  # nbytes == 9
            lowb = np.uint64(nbits - 64)
            hi = np.ascontiguousarray(mat[:, b0 : b0 + 8]).view(">u8").ravel().astype(np.uint64)
            lo = mat[:, b0 + 8].astype(np.uint64) >> (np.uint64(8) - lowb)
            out[:, lane] = (((hi << lowb) | lo) & vmask)
    return out.ravel()[:n]


def zigzag(values: np.ndarray) -> np.ndarray:
    """Map signed int64 -> unsigned (0,-1,1,-2 -> 0,1,2,3) for bit-packing."""
    v = values.astype(np.int64, copy=False)
    return ((v << np.int64(1)) ^ (v >> np.int64(63))).view(np.uint64)


def unzigzag(values: np.ndarray) -> np.ndarray:
    """Inverse of :func:`zigzag`."""
    v = values.astype(np.uint64, copy=False)
    return ((v >> np.uint64(1)).view(np.int64)) ^ -((v & np.uint64(1)).view(np.int64))
