"""Trained-dictionary container (O59) — mirrors the reference's zstd
cdict/ddict API and tests (``container.ex:312-362``,
``test/compression/dict_compression_test.exs``)."""

from __future__ import annotations

import numpy as np
import pytest

from gorilla_stream_spark.codecs import (
    compress_with_dict,
    decode_array,
    decompress_with_dict,
    encode_array,
    register_container_dict,
    train_container_dict,
    wrap_container,
)


def _sample_buffers(n=100, points=100, seed=11):
    """100 similar small encoded buffers — the reference's training setup
    (dict_compression_test.exs:10-20: 100 compressed 100-point streams)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        vals = (5000 + (rng.random(points) * 1000).astype(np.int64)).astype(np.int64)
        out.append(encode_array(vals, codec="auto"))
    return out


def test_raw_dict_roundtrip():
    samples = _sample_buffers()
    d = train_container_dict(samples)
    sample = samples[0]
    comp = compress_with_dict(sample, d)
    assert isinstance(comp, bytes) and len(comp) > 0
    assert decompress_with_dict(comp, d) == sample


def test_empty_binary_passthrough():
    # dict_compression_test.exs:45-52
    d = train_container_dict(_sample_buffers(5))
    assert compress_with_dict(b"", d) == b""
    assert decompress_with_dict(b"", d) == b""


def test_container_roundtrip_via_decode_array():
    samples = _sample_buffers()
    d = train_container_dict(samples)
    vals = np.arange(500, dtype=np.int64) * 3 + 7
    inner = encode_array(vals, codec="auto")
    wrapped = wrap_container(inner, method="zlib-dict", zdict=d)
    register_container_dict(d)
    out = decode_array(wrapped)
    assert np.array_equal(out, vals)


def test_unregistered_dict_fails_loud():
    from gorilla_stream_spark.codecs import _CONTAINER_DICTS

    d = train_container_dict(_sample_buffers(10))
    vals = np.arange(100, dtype=np.int64)
    wrapped = wrap_container(encode_array(vals), method="zlib-dict", zdict=d)
    import zlib

    did = zlib.crc32(d) & 0xFFFFFFFF
    _CONTAINER_DICTS.pop(did, None)
    with pytest.raises(ValueError, match="register_container_dict"):
        decode_array(wrapped)
    register_container_dict(d)
    assert np.array_equal(decode_array(wrapped), vals)


def test_dict_beats_plain_on_small_blocks():
    """dict_compression_test.exs:55-69's intent, asserted strictly: on small
    blocks drawn from the training distribution the shared dictionary must
    out-compress dictionary-less zlib."""
    samples = _sample_buffers(100)
    d = train_container_dict(samples)
    block = samples[0]
    dict_wrapped = wrap_container(block, method="zlib-dict", zdict=d)
    plain_wrapped = wrap_container(block, method="zlib", level=9)
    # strip container headers (6 B plain / 10 B dict) for a fair body compare
    assert len(dict_wrapped) - 10 < len(plain_wrapped) - 6


def test_requires_dict_bytes():
    with pytest.raises(ValueError, match="requires zdict"):
        wrap_container(b"\x00" * 100, method="zlib-dict")


def test_zstd_dict_path_present_or_gracefully_absent():
    """The reference's ACTUAL cdict path (container.ex:312-340, ezstd's
    raw-content ``create_cdict``).  Two bindings are probed at import: the
    python `zstandard` module, then a ctypes binding to the system
    libzstd's ``ZSTD_*_usingDict`` one-shot API (present in this
    environment).  Where either ships, the container must roundtrip and
    beat plain zstd on small blocks; where neither does, the error must
    name the constraint and point at the zlib-dict equivalent."""
    from gorilla_stream_spark.codecs import _ZSTANDARD, _ZSTD_CT

    samples = _sample_buffers(100)
    d = train_container_dict(samples)
    block = samples[0]
    if _ZSTANDARD is None and _ZSTD_CT is None:  # pragma: no cover - env
        with pytest.raises(ValueError, match="zstandard.*libzstd"):
            wrap_container(block, method="zstd-dict", zdict=d)
        with pytest.raises(ValueError, match="requires zdict"):
            wrap_container(block, method="zstd-dict")
    else:
        wrapped = wrap_container(block, method="zstd-dict", zdict=d)
        register_container_dict(d)
        assert np.array_equal(decode_array(wrapped), decode_array(block))
        plain = wrap_container(block, method="zstd", level=9)
        assert len(wrapped) - 10 < len(plain) - 6


def test_zstd_dict_roundtrip_and_corrupt_frame():
    """Live-tier zstd-dict checks (ctypes libzstd here): many-block
    roundtrip, dict-aids-ratio across the whole sample set, and a corrupt
    frame raising cleanly instead of returning garbage."""
    from gorilla_stream_spark.codecs import _ZSTANDARD, _ZSTD_CT

    if _ZSTANDARD is None and _ZSTD_CT is None:  # pragma: no cover - env
        pytest.skip("no zstd dict binding in this environment")
    samples = _sample_buffers(60)
    d = train_container_dict(samples)
    register_container_dict(d)
    dict_total = plain_total = 0
    for block in samples:
        wrapped = wrap_container(block, method="zstd-dict", zdict=d, level=9)
        assert np.array_equal(decode_array(wrapped), decode_array(block))
        dict_total += len(wrapped) - 10
        plain_total += len(wrap_container(block, method="zstd", level=9)) - 6
    assert dict_total < plain_total
    wrapped = wrap_container(samples[0], method="zstd-dict", zdict=d)
    corrupt = wrapped[:12] + bytes([wrapped[12] ^ 0xFF]) + wrapped[13:]
    with pytest.raises(ValueError):
        decode_array(corrupt)


def test_train_is_deterministic_and_bounded():
    samples = _sample_buffers(50)
    assert train_container_dict(samples) == train_container_dict(samples)
    assert len(train_container_dict(samples, max_size=1024)) <= 1024


@pytest.mark.parametrize("method", ["zlib-dict", "zstd-dict"])
def test_engine_e2e_dict_container(spark, method):
    import pyspark.sql.functions as F

    from gorilla_stream_spark import decode, encode

    if method == "zstd-dict":
        from gorilla_stream_spark.codecs import _ZSTANDARD, _ZSTD_CT

        if _ZSTANDARD is None and _ZSTD_CT is None:  # pragma: no cover - env
            pytest.skip("no zstd dict binding in this environment")

    docs = spark.range(200).select(
        F.col("id").cast("string").alias("doc_id"),
        F.expr("transform(sequence(1, 50), i -> cast((id * 7 + i) % 256 as int))").alias(
            "tokens"
        ),
        F.lit("s").alias("source"),
    )
    # train on a driver-side sample of encoded buffers (bounded), then the
    # dict rides task closures on both sides
    sample_rows = (
        encode(docs.limit(20), codec="auto", num_partitions=1).select("buffer").collect()
    )
    d = train_container_dict([bytes(r["buffer"]) for r in sample_rows])
    enc = encode(
        docs, codec="auto", num_partitions=2, container=method, container_dict=d
    )
    dec = decode(enc, container_dict=d)
    back = {r["doc_id"]: list(r["tokens"]) for r in dec.collect()}
    src = {r["doc_id"]: list(r["tokens"]) for r in docs.collect()}
    assert back == src
