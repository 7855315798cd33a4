"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The training-data engine treats media payloads exactly like token buffers:
opaque ``binary`` columns with typed manifest metadata, moved in Arrow
batches, partitioned by content hash.  The *decode* step (pixel/sample
decoding) requires media libraries that are not in this environment, so the
decode kernel is PLUGGABLE: ``image_features``/``resize_images`` take a
``kernel=`` callable that runs inside the Arrow batch loop on executors —
a real PIL/ffmpeg kernel drops in without touching any Spark plumbing.  The
default kernel is a DETERMINISTIC FAKE (clearly marked) that parses the
synthetic 8-byte header the tests generate; everything Spark-side is real
and tested: schemas, Arrow batch shapes, partitioning, frame chunk
arithmetic, metadata extraction.

No reference analog (the reference is numeric-timeseries only); this module
exists because a 100 TB training pipeline carries media next to text
(SURVEY.md round-2 scope).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extract_meta",
    "frame_sample",
    "image_features",
    "resize_images",
    "fake_image_kernel",
]


def extract_meta(df: DataFrame, payload_col: str = "payload", id_col: str = "item_id") -> DataFrame:
    """Typed metadata for a binary media column — all JVM-side, no decode.

    ``fp_md5`` doubles as the exact-dedup / lineage key (same contract as
    ``textops.doc_fingerprint``).
    """
    return df.select(
        F.col(id_col),
        F.col("media_type") if "media_type" in df.columns else F.lit(None).cast("string").alias("media_type"),
        F.length(payload_col).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("fp_md5"),
        F.crc32(F.col(payload_col)).cast("long").alias("crc32"),
    )


def frame_sample(
    df: DataFrame,
    frame_bytes: int,
    every_n: int = 1,
    payload_col: str = "payload",
    id_col: str = "item_id",
) -> DataFrame:
    """Split each payload into fixed-size frames, keep every Nth.

    The video frame-sampling plumbing: deterministic chunk arithmetic,
    one output row per sampled frame, all computed with JVM array functions
    (``sequence`` + ``substring``), so the expensive media decode downstream
    only ever sees the sampled frames.
    """
    if frame_bytes <= 0 or every_n <= 0:
        raise ValueError("frame_bytes and every_n must be positive")
    n_frames = F.ceil(F.length(payload_col) / F.lit(frame_bytes)).cast("int")
    idx = F.explode(
        F.expr(
            f"filter(sequence(0, greatest(ceil(length({payload_col}) / {frame_bytes}) - 1, 0)),"
            f" i -> i % {every_n} = 0)"
        )
    )
    return (
        df.filter(F.length(payload_col) > 0)
        .select(F.col(id_col), F.col(payload_col), n_frames.alias("n_frames"), idx.alias("frame_idx"))
        .select(
            id_col,
            "n_frames",
            F.col("frame_idx").cast("int"),
            F.expr(
                f"substring({payload_col}, frame_idx * {frame_bytes} + 1, {frame_bytes})"
            ).alias("frame"),
        )
    )


def fake_image_kernel(raw: bytes) -> tuple[int, int, float]:
    """DETERMINISTIC FAKE decode kernel (no imaging libs in this env).

    Reads the synthetic 8-byte header the tests generate (width, height as
    uint32-LE) and computes the byte-level mean over the body.  Stands in
    for a real ``PIL.Image.open`` kernel with the identical signature.
    """
    if len(raw) >= 8:
        w = int.from_bytes(raw[0:4], "little")
        h = int.from_bytes(raw[4:8], "little")
    else:
        w = h = 0
    body = np.frombuffer(raw[8:], dtype=np.uint8)
    mean = float(body.mean()) if body.size else 0.0
    return w, h, mean


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "item_id",
    kernel: Callable[[bytes], tuple[int, int, float]] | None = None,
) -> DataFrame:
    """Per-image (width, height, mean) features via one Arrow pass.

    ``kernel`` is the pluggable decode step: a picklable callable
    ``bytes -> (width, height, mean)`` executed per payload inside the Arrow
    batch loop on executors — wire a real imaging decode here (e.g. a
    PIL-based closure) without touching the Spark plumbing.  Defaults to
    :func:`fake_image_kernel`, the deterministic test kernel; installing an
    imaging library changes nothing until a caller passes a real kernel.

    Wall-time expectations: the default kernel is fully vectorized (header
    gather + one segmented cumsum, millions of payloads/s/core) so the
    Spark plumbing never dominates; a REAL decode kernel is per-payload by
    nature and JPEG/PNG parsing dominates at ~100-1000 images/s/core —
    size ``spark.sql.files.maxPartitionBytes`` (or repartition upstream)
    so a partition holds minutes, not hours, of decode work, and expect
    the job to be CPU-bound on executors, not shuffle-bound.
    """
    import pyarrow as pa

    def fake_batch(payloads) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Vectorized fake kernel over a whole Arrow binary column: header
        fields by offset gather, body means by one segmented cumsum — no
        per-payload Python.  (A REAL decode kernel is per-payload by nature
        — JPEG/PNG parsing dominates wall time — so the custom-kernel path
        below stays a per-row loop; this fast path only covers the
        deterministic test kernel.)"""
        import pyarrow.compute as pc

        if payloads.null_count:
            payloads = pc.fill_null(payloads, b"")
        arr = payloads.combine_chunks() if isinstance(payloads, pa.ChunkedArray) else payloads
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ].astype(np.int64)
        values = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else np.empty(0, np.uint8)
        starts, ends = offs[:-1], offs[1:]
        lens = ends - starts
        w = np.zeros(len(arr), dtype=np.int64)
        h = np.zeros(len(arr), dtype=np.int64)
        hdr = lens >= 8
        if hdr.any():
            sh = (np.uint64(8) * np.arange(4, dtype=np.uint64))
            idx = starts[hdr, None] + np.arange(4, dtype=np.int64)
            w[hdr] = (values[idx].astype(np.uint64) << sh).sum(1).astype(np.int64)
            h[hdr] = (values[idx + 4].astype(np.uint64) << sh).sum(1).astype(np.int64)
        cs = np.concatenate(([0], np.cumsum(values, dtype=np.int64)))
        bstart = starts + np.minimum(lens, 8)
        bsum = cs[ends] - cs[bstart]
        blen = ends - bstart
        mean = np.where(blen > 0, bsum / np.maximum(blen, 1), 0.0)
        return w, h, mean

    def fn(batches: Iterator) -> Iterator:
        for rb in batches:
            if rb.num_rows == 0:
                continue
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            payloads = rb.column(1)
            if kernel is None:
                w_arr, h_arr, mean_arr = fake_batch(payloads)
                if (
                    (w_arr < 0).any() or (w_arr >= 1 << 31).any()
                    or (h_arr < 0).any() or (h_arr >= 1 << 31).any()
                ):
                    # match the kernel path's fail-loud behavior: a header
                    # declaring dims >= 2^31 is corrupt media, and int32
                    # truncation would emit silently negative sizes
                    raise ValueError("image header width/height outside int32 range")
                w_out = w_arr.astype(np.int32)
                h_out = h_arr.astype(np.int32)
                mean_out = mean_arr
            else:
                w_out, h_out, mean_out = [], [], []
                for i in range(rb.num_rows):
                    raw = payloads[i].as_py() or b""
                    w, h, mean = kernel(raw)
                    w_out.append(int(w))
                    h_out.append(int(h))
                    mean_out.append(float(mean))
            yield pa.RecordBatch.from_pydict(
                {
                    "item_id": pa.array(ids, pa.int64()),
                    "width": pa.array(w_out, pa.int32()),
                    "height": pa.array(h_out, pa.int32()),
                    "mean_byte": pa.array(mean_out, pa.float64()),
                }
            )

    slim = df.select(F.col(id_col).cast("long").alias("item_id"), F.col(payload_col))
    return slim.mapInArrow(fn, "item_id long, width int, height int, mean_byte double")


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "item_id",
    kernel: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image resize through a pluggable kernel ``(bytes, w, h) -> bytes``.

    Without a kernel this raises at PLAN-BUILD time (no imaging library is
    bundled in this environment) so a pipeline fails before any upstream
    work runs, never inside an executor hours in.  With a kernel (e.g. a
    PIL resize closure) the resize runs in the same Arrow batch loop as
    :func:`image_features` — the Spark plumbing is identical and tested.
    """
    if kernel is None:
        raise NotImplementedError(
            "resize_images needs a decode kernel: no imaging library"
            " (PIL/opencv) is bundled in this environment — pass"
            " kernel=(bytes, w, h) -> bytes to wire a real one in"
        )
    import pyarrow as pa

    if width <= 0 or height <= 0:
        raise ValueError("width and height must be positive")

    def fn(batches: Iterator) -> Iterator:
        for rb in batches:
            if rb.num_rows == 0:
                continue
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            payloads = rb.column(1)
            out = [kernel(payloads[i].as_py() or b"", width, height) for i in range(rb.num_rows)]
            yield pa.RecordBatch.from_pydict(
                {
                    "item_id": pa.array(ids, pa.int64()),
                    "payload": pa.array(out, pa.binary()),
                }
            )

    slim = df.select(F.col(id_col).cast("long").alias("item_id"), F.col(payload_col))
    return slim.mapInArrow(fn, "item_id long, payload binary")
