"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The training-data engine treats media payloads exactly like token buffers:
opaque ``binary`` columns with typed manifest metadata, moved in Arrow
batches, partitioned by content hash.  The *decode* step (pixel/sample
decoding) requires media libraries that are not in this environment — it is
STUBBED behind an import-try with a deterministic fake (clearly marked), but
everything Spark-side is real and tested: schemas, Arrow batch shapes,
partitioning, frame chunk arithmetic, metadata extraction.

No reference analog (the reference is numeric-timeseries only); this module
exists because a 100 TB training pipeline carries media next to text
(SURVEY.md round-2 scope).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extract_meta",
    "frame_sample",
    "image_features",
    "resize_images",
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


try:  # pragma: no cover - environment-dependent
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False


def image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "item_id"
) -> DataFrame:
    """Per-image features via one Arrow pass.

    With a real imaging library the kernel would decode pixels; this
    environment has none, so the kernel is a DETERMINISTIC FAKE clearly
    marked below: it reads a synthetic 8-byte header (width,height as
    uint32-LE — the tests generate payloads in this shape) and computes the
    byte-level mean/entropy proxy over the body.  The Spark-side contract —
    Arrow batch shape, schema, bounded memory per batch — is the real,
    tested part.
    """
    import pyarrow as pa

    def fn(batches: Iterator) -> Iterator:
        for rb in batches:
            if rb.num_rows == 0:
                continue
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            payloads = rb.column(1)
            w_out, h_out, mean_out = [], [], []
            for i in range(rb.num_rows):
                raw = payloads[i].as_py() or b""
                if _HAVE_PIL:  # pragma: no cover - not in this environment
                    raise NotImplementedError(
                        "real image decode path not wired in this sandbox"
                    )
                # --- DETERMINISTIC FAKE DECODE (no imaging libs present) ---
                if len(raw) >= 8:
                    w = int.from_bytes(raw[0:4], "little")
                    h = int.from_bytes(raw[4:8], "little")
                else:
                    w = h = 0
                body = np.frombuffer(raw[8:], dtype=np.uint8)
                mean = float(body.mean()) if body.size else 0.0
                w_out.append(w)
                h_out.append(h)
                mean_out.append(mean)
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


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — requires an imaging library; explicitly unavailable.

    Raises immediately so a pipeline fails at plan-build time, not inside an
    executor after hours of upstream work.
    """
    if not _HAVE_PIL:
        raise NotImplementedError(
            "resize_images needs an imaging library (PIL/opencv); not bundled"
            " in this environment — the Arrow/partitioning plumbing to slot a"
            " real kernel into is image_features()"
        )
    raise NotImplementedError("real resize kernel not wired in this sandbox")
