"""FSST-style symbol-table codec for token arrays.

FSST (Boncz/Neumann/Leis, VLDB 2020) compresses strings by replacing
frequent substrings with 1-byte codes from a trained symbol table.  Our
payload is int32 token streams, so the analog is a trained table of frequent
*token pairs*: each table hit replaces two tokens with one super-symbol, and
the rewritten stream is then dict/FOR bit-packed.  The precedent in the
reference is the trained-dictionary zstd path
(``/root/reference/lib/gorilla_stream/compression/container.ex:312-362``) —
train once on a sample, apply everywhere — and Chimp128's
value-revisit exploitation (``c_src/gorilla_nif.cpp:577-588``).

Everything is vectorized: pair counting via ``np.unique`` on packed
(hi<<32|lo) keys, greedy non-overlapping match selection via run-parity
(within any maximal run of consecutive match positions, greedy
left-to-right keeps exactly the even offsets), and decode via offset
scatter.  One rewrite pass only (no recursive pairing) — bounded, cheap,
and already captures most bigram redundancy.
"""

from __future__ import annotations

import struct

import numpy as np

from gorilla_stream_spark.codecs import intcodecs

__all__ = ["train_pair_table", "fsst_encode", "fsst_decode"]

_I64 = np.int64
MAX_TABLE = 4096


def _pair_keys(a: np.ndarray) -> np.ndarray:
    """Pack adjacent token pairs into uint64 keys (tokens must fit uint32)."""
    u = a.astype(np.uint64, copy=False)
    return (u[:-1] << np.uint64(32)) | u[1:]


def train_pair_table(sample: np.ndarray, table_size: int = 1024, min_count: int = 4) -> np.ndarray:
    """Return sorted uint64 pair-keys of the most frequent adjacent pairs.

    Deterministic given the sample (ties broken by key order), which keeps
    resumed runs bit-identical — the same requirement the reference's
    trained zstd dict has (container.ex:322-335).
    """
    if sample.size < 2:
        return np.empty(0, dtype=np.uint64)
    return _train_from_keys(_pair_keys(_as_tokens(sample)), table_size, min_count)


def _train_from_keys(pair_keys: np.ndarray, table_size: int, min_count: int) -> np.ndarray:
    # np.unique (sort-based) beats hash factorize here: pair keys are
    # near-unique (card ~ n), where hashing a million-entry table loses
    keys, counts = np.unique(pair_keys, return_counts=True)
    good = counts >= min_count
    keys, counts = keys[good], counts[good]
    if keys.size > table_size:
        # top-k by count, ties by key for determinism
        order = np.lexsort((keys, -counts))[:table_size]
        keys = keys[order]
    return np.sort(keys)


def _as_tokens(a: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a, dtype=_I64)
    if a.size and (a.min() < 0 or a.max() > 0xFFFFFFFF - 1):
        raise ValueError("fsst codec requires tokens in [0, 2^32-1)")
    return a


def _greedy_match_positions(match: np.ndarray) -> np.ndarray:
    """Sorted positions of greedily-selected non-overlapping matches.

    Greedy left-to-right over pair positions: a match is taken iff the
    previous position was not taken.  Within each maximal run of True, that
    selects even offsets — computable vectorized from run starts.
    """
    pos = np.flatnonzero(match)
    if pos.size == 0:
        return pos
    # run starts: first position, or position whose predecessor isn't a match
    new_run = np.empty(pos.size, dtype=bool)
    new_run[0] = True
    np.not_equal(pos[1:], pos[:-1] + 1, out=new_run[1:])
    run_id = np.cumsum(new_run) - 1
    run_start = pos[new_run][run_id]
    taken = ((pos - run_start) & 1) == 0
    return pos[taken]


def _greedy_matches(match: np.ndarray) -> np.ndarray:
    """Boolean mask of greedily-selected non-overlapping match positions."""
    out = np.zeros(match.size, dtype=bool)
    out[_greedy_match_positions(match)] = True
    return out


def fsst_encode(a: np.ndarray, table: np.ndarray | None = None, passes: int = 2) -> bytes:
    """Encode with a pair table (trained on the block itself if not given).

    ``passes > 1`` recursively re-pairs the rewritten stream (pairs of
    super-symbols = 4-gram phrases), keeping the recursion only when it
    shrinks the buffer — ~19% smaller on natural text, no decode options
    needed (the body is a framed self-describing buffer).
    """
    from gorilla_stream_spark.codecs import DICT, FSST

    a = _as_tokens(a)
    n = a.size
    # pair keys are needed by both training and matching — build them once
    keys = _pair_keys(a) if n >= 2 else np.empty(0, dtype=np.uint64)
    if table is None:
        table = _train_from_keys(keys, 1024, 4) if n >= 2 else np.empty(0, dtype=np.uint64)
    table = np.asarray(table, dtype=np.uint64)
    if table.size > MAX_TABLE:
        # the header stores table size as u16 — fail before doing the work,
        # not in struct.pack at the end
        raise ValueError(f"fsst table size {table.size} exceeds {MAX_TABLE}")
    if n < 2 or table.size == 0:
        body = bytes([DICT]) + intcodecs.dict_encode(a)
        return struct.pack("<IIH", n, 0, 0) + body
    idx = np.searchsorted(table, keys)
    idx_c = np.minimum(idx, table.size - 1)
    match = table[idx_c] == keys
    take_pos = _greedy_match_positions(match)
    base = int(a.max()) + 1
    # rewrite: at taken pair-start positions emit base+table_index, drop the
    # follower token (positions index the n-1 pair starts); a kept element at
    # old position p lands at p - (#drops before p), and exactly i drops
    # precede the i-th non-overlapping take position
    keep = np.ones(n, dtype=bool)
    keep[take_pos + 1] = False
    rewritten = a[keep]
    rewritten[take_pos - np.arange(take_pos.size)] = base + idx_c[take_pos].astype(_I64)
    body = bytes([DICT]) + intcodecs.dict_encode(rewritten)
    if passes > 1 and rewritten.size >= 1024 and int(rewritten.max()) < 0xFFFFFFFF - 1:
        # the recursive pass costs as much as the first; pay it only when a
        # cheap sampled probe of the rewritten stream finds enough 2nd-level
        # pair structure (each taken pair removes ~1 symbol, so the sampled
        # taken-rate approximates the relative shrink)
        s = rewritten[:16384]
        tab2 = train_pair_table(s)
        go_deeper = False
        if tab2.size:
            k2 = _pair_keys(s)
            i2 = np.minimum(np.searchsorted(tab2, k2), tab2.size - 1)
            # k/m float division: exactly the old mask.mean() >= 0.05 predicate
            go_deeper = _greedy_match_positions(tab2[i2] == k2).size / k2.size >= 0.05
        if go_deeper:
            deeper = bytes([FSST]) + fsst_encode(rewritten, passes=passes - 1)
            if len(deeper) < len(body):
                body = deeper
    tbuf = table.astype("<u8").tobytes()
    return struct.pack("<IIH", n, base, table.size) + tbuf + body


def fsst_decode(buf: bytes) -> np.ndarray:
    from gorilla_stream_spark.codecs import decode_array

    n, base, tsize = struct.unpack_from("<IIH", buf, 0)
    intcodecs.bitio.check_count(n)
    mv = memoryview(buf)
    off = 10 + tsize * 8
    body = decode_array(mv[off:])
    if tsize == 0:
        # the no-table fallback stores the stream verbatim: its own count
        # must still match the header (a forged n would otherwise pass)
        if body.size != n:
            raise ValueError(f"fsst count mismatch: header n={n}, body {body.size}")
        return body
    table = np.frombuffer(mv[10:off], dtype="<u8")
    is_pair = body >= base
    m = body.size
    if m + int(is_pair.sum()) != n:
        # corrupt header count must raise, not return np.empty() garbage
        raise ValueError(
            f"fsst count mismatch: header n={n},"
            f" reconstructed {m + int(is_pair.sum())}"
        )
    out_pos = np.arange(m) + np.concatenate(([0], np.cumsum(is_pair[:-1])))
    out = np.empty(n, dtype=_I64)
    keys = np.empty(m, dtype=np.uint64)
    keys[is_pair] = table[(body[is_pair] - base).astype(np.intp)]
    out[out_pos[~is_pair]] = body[~is_pair]
    pp = out_pos[is_pair]
    out[pp] = (keys[is_pair] >> np.uint64(32)).astype(_I64)
    out[pp + 1] = (keys[is_pair] & np.uint64(0xFFFFFFFF)).astype(_I64)
    return out
