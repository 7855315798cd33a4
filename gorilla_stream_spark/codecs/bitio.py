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
]


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
    """
    n = values.size
    if n == 0 or width == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    # big-endian byte view -> (n, 64) bit matrix -> keep low `width` bits
    bits = np.unpackbits(v.astype(">u8").view(np.uint8).reshape(n, 8), axis=1)
    return np.packbits(bits[:, 64 - width :].ravel()).tobytes()


def unpack(buf: bytes | np.ndarray, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack` — returns ``n`` uint64 values."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else buf
    bits = np.unpackbits(raw, count=n * width).reshape(n, width)
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, 64 - width :] = bits
    packed = np.packbits(full.reshape(-1)).reshape(n, 8)
    return packed.view(">u8").ravel().astype(np.uint64)


def zigzag(values: np.ndarray) -> np.ndarray:
    """Map signed int64 -> unsigned (0,-1,1,-2 -> 0,1,2,3) for bit-packing."""
    v = values.astype(np.int64, copy=False)
    return ((v << np.int64(1)) ^ (v >> np.int64(63))).view(np.uint64)


def unzigzag(values: np.ndarray) -> np.ndarray:
    """Inverse of :func:`zigzag`."""
    v = values.astype(np.uint64, copy=False)
    return ((v >> np.uint64(1)).view(np.int64)) ^ -((v & np.uint64(1)).view(np.int64))
