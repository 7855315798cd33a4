"""Multimodal binary columns: metadata, frame sampling, stubbed decode."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from gorilla_stream_spark import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    for i in range(20):
        w, h = 4 + i, 3 + i
        body = bytes((i * 7 + j) % 256 for j in range(w * h))
        payload = w.to_bytes(4, "little") + h.to_bytes(4, "little") + body
        rows.append((i, "image/fake", bytearray(payload)))
    df = spark.createDataFrame(rows, "item_id long, media_type string, payload binary")
    df.cache().count()
    return df


def test_extract_meta_matches_local(spark, media):
    rows = {r.item_id: r for r in M.extract_meta(media).collect()}
    src = {r.item_id: bytes(r.payload) for r in media.collect()}
    import hashlib

    for i, raw in src.items():
        assert rows[i].n_bytes == len(raw)
        assert rows[i].fp_md5 == hashlib.md5(raw).hexdigest()
        assert rows[i].crc32 == zlib.crc32(raw)


def test_frame_sample_chunks_exact(spark, media):
    out = M.frame_sample(media, frame_bytes=10, every_n=2).collect()
    src = {r.item_id: bytes(r.payload) for r in media.collect()}
    by_item = {}
    for r in out:
        by_item.setdefault(r.item_id, []).append(r)
    for i, raw in src.items():
        total = -(-len(raw) // 10)
        want_idx = [j for j in range(total) if j % 2 == 0]
        got = sorted(by_item[i], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in got] == want_idx
        assert all(r.n_frames == total for r in got)
        for r in got:
            assert bytes(r.frame) == raw[r.frame_idx * 10 : r.frame_idx * 10 + 10]


def test_image_features_fake_decode(spark, media):
    rows = {r.item_id: r for r in M.image_features(media).collect()}
    for i in range(20):
        w, h = 4 + i, 3 + i
        body = bytes((i * 7 + j) % 256 for j in range(w * h))
        assert rows[i].width == w and rows[i].height == h
        assert abs(rows[i].mean_byte - sum(body) / len(body)) < 1e-9


def test_resize_raises_plan_time(spark, media):
    with pytest.raises(NotImplementedError, match="imaging library"):
        M.resize_images(media, 64, 64)


def test_image_features_custom_kernel_injection(spark, media):
    # custom kernel (a closure, pickled by value): proves the pluggable
    # seam — real PIL/ffmpeg kernels slot in the same way without touching
    # the Spark plumbing
    def _toy_kernel(raw: bytes) -> tuple[int, int, float]:
        return len(raw), zlib.crc32(raw) % 1000, float(raw[0]) if raw else -1.0

    rows = {r.item_id: r for r in M.image_features(media, kernel=_toy_kernel).collect()}
    for r in media.collect():
        raw = bytes(r.payload)
        w, h, m = _toy_kernel(raw)
        got = rows[r.item_id]
        assert (got.width, got.height) == (w, h)
        assert abs(got.mean_byte - m) < 1e-12


def test_resize_with_custom_kernel_runs(spark, media):
    # with a kernel injected, resize is a plain Arrow pass (no raise)
    def crop_kernel(raw: bytes, w: int, h: int) -> bytes:
        return raw[: w * h]

    out = {r.item_id: bytes(r.payload) for r in M.resize_images(media, 4, 2, kernel=crop_kernel).collect()}
    src = {r.item_id: bytes(r.payload) for r in media.collect()}
    assert out == {i: p[:8] for i, p in src.items()}


def test_image_features_vectorized_matches_per_row_kernel(spark):
    # the vectorized default path must agree exactly with the per-row fake
    # kernel on every edge: empty, sub-header, header-only, null payload
    import struct

    from gorilla_stream_spark.multimodal import fake_image_kernel, image_features

    payloads = [
        struct.pack("<II", 640, 480) + bytes(range(256)),
        b"",
        b"\x01\x02\x03",  # shorter than the 8-byte header
        struct.pack("<II", 1, 1),  # header only
        None,
        struct.pack("<II", 12, 34) + b"\xff" * 1000,
    ]
    rows = [(i, p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    got = {
        r.item_id: (r.width, r.height, r.mean_byte)
        for r in image_features(df).collect()
    }
    for i, p in enumerate(payloads):
        w, h, m = fake_image_kernel(p or b"")
        assert got[i][0] == w and got[i][1] == h
        assert abs(got[i][2] - m) < 1e-12, (i, got[i], (w, h, m))
