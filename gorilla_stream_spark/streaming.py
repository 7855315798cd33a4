"""Structured Streaming encode: continuous token feeds -> compressed blocks.

The reference's streaming story is a lazy chunked Enumerable
(``/root/reference/lib/gorilla_stream/stream.ex:62-125``) plus incremental
zlib/zstd contexts (``compression/container.ex:368-545``).  In Spark the
equivalent is ``readStream -> foreachBatch(encode + append)``: each
micro-batch is bounded, so the batch engine's whole encode path (salted
repartition, block chunking, codec auto-select, manifest) is reused verbatim
— no separate stateful operator needed, exactly as SURVEY.md §2.3/O24
concluded.

Exactly-once: foreachBatch may replay a batch after failure; the sink
appends blocks tagged with ``batch_id`` and the replay guard drops
already-committed batch ids (idempotent append), mirroring the checkpoint
protocol in ``checkpoint.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gorilla_stream_spark.engine import DEFAULT_BLOCK_TOKENS, encode

__all__ = ["encode_stream", "dedup_stream", "windowed_stats", "simhash_neardup_stream"]


def _ckpt_join(*parts: str) -> str:
    """URI-safe path join for checkpoint locations (local, HDFS, S3)."""
    return "/".join(p.rstrip("/") for p in parts)


def _hadoop_path(spark, path_str: str):
    """(FileSystem, Path) for ``path_str`` via the Hadoop FS API.

    The replay-guard markers MUST live on the same filesystem as the
    checkpoint dir — driver-local ``os.path`` would silently break
    exactly-once the moment ``checkpoint_dir`` is an HDFS/S3 URI.
    """
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def marker_exists(spark, marker: str) -> bool:
    fs, jpath = _hadoop_path(spark, marker)
    return bool(fs.exists(jpath))


def write_marker(spark, marker: str) -> None:
    """Create an (empty) commit marker through the checkpoint filesystem."""
    fs, jpath = _hadoop_path(spark, marker)
    fs.mkdirs(jpath.getParent())
    out = fs.create(jpath, True)
    out.close()


def encode_stream(
    stream_df: DataFrame,
    output_path: str,
    checkpoint_dir: str,
    codec: str = "auto",
    num_partitions: int | None = None,
    block_tokens: int = DEFAULT_BLOCK_TOKENS,
    trigger: dict | None = None,
):
    """Start a streaming query encoding each micro-batch of token rows.

    ``stream_df`` must have (doc_id, tokens, [n_tok, source]) columns.
    Returns the StreamingQuery; caller awaits/stops it.
    """
    spark = stream_df.sparkSession
    committed_marker = _ckpt_join(checkpoint_dir, "committed_batches")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = _ckpt_join(committed_marker, str(batch_id))
        # replayed batch already fully committed — markers round-trip through
        # the Hadoop FS of the checkpoint location, so exactly-once holds on
        # HDFS/S3 checkpoint dirs, not just the driver's local disk
        if marker_exists(spark, marker):
            return
        enc = encode(
            batch_df,
            codec=codec,
            num_partitions=num_partitions,
            block_tokens=block_tokens,
        ).withColumn("batch_id", F.lit(batch_id))
        enc.write.mode("append").option("compression", "zstd").parquet(output_path)
        write_marker(spark, marker)

    writer = stream_df.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", _ckpt_join(checkpoint_dir, "spark")
    )
    trigger = trigger or {"availableNow": True}
    return writer.trigger(**trigger).start()


DEDUP_OUT_SCHEMA = "doc_id string, text string"
_DEDUP_STATE_SCHEMA = "seen binary"


def dedup_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
):
    """Streaming exact-content dedup: keep the first-seen copy across ALL
    micro-batches (``applyInPandasWithState`` — custom stateful operator).

    Rows group by a stable content-hash bucket (``xxhash64(text) % B``);
    each bucket's state is the set of md5 digests seen so far (16 B/doc,
    stored as one concatenated binary blob).  Within a batch the lowest id
    wins; across batches the earlier batch wins.  At 10^12-doc scale the
    state store is the bottleneck — raise ``n_buckets`` to spread state and
    back the query with the RocksDB state store; the operator logic is
    unchanged.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = stream_df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("text"),
        # carry the ORIGINAL-typed id for within-batch ordering: sorting the
        # string cast would rank '10' < '9' and pick a different survivor
        # than batch dedup_exact (which orders by the native column type)
        F.col(id_col).alias("__oid"),
        F.unhex(F.md5(text_col)).alias("__h"),
        F.pmod(F.xxhash64(text_col), F.lit(n_buckets)).alias("__b"),
    )

    def fn(key, pdfs, state):
        import pandas as pd

        blob = state.get[0] if state.exists else b""
        seen = {blob[i : i + 16] for i in range(0, len(blob), 16)}
        outs = []
        new: list[bytes] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("__oid", kind="stable")
            pdf = pdf[~pdf["__h"].apply(bytes).isin(seen)]
            pdf = pdf.drop_duplicates("__h", keep="first")
            for h in pdf["__h"]:
                hb = bytes(h)
                seen.add(hb)
                new.append(hb)
            outs.append(pdf[["doc_id", "text"]])
        if new:
            state.update((blob + b"".join(new),))
        if outs:
            yield pd.concat(outs)

    return keyed.groupBy("__b").applyInPandasWithState(
        fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_stats(
    stream_df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = (),
):
    """Event-time windowed rollup with a watermark for late data.

    The streaming pre-aggregation in front of ``encode_timeseries``: rows
    older than the watermark relative to the max seen event time are dropped
    by the engine (bounded state), everything else lands in its event-time
    window regardless of arrival order.  Output mode must be ``append`` so
    finalized windows flow straight into the block encoder.
    """
    cols = [F.window(F.col(ts_col), window).alias("win"), *[F.col(k) for k in keys]]
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*cols)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *[F.col(k) for k in keys],
            "n",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


def simhash_neardup_stream(
    stream_df,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
):
    """Streaming near-dup candidate pairs across ALL micro-batches
    (``applyInPandasWithState`` — the stateful analog of
    ``textops.simhash_neardup_pairs``).

    Each batch computes 60-bit SimHash signatures row-locally with the
    pure-SQL HOF expression (a column expression, hence streaming-safe and
    bit-identical to the batch operator); rows bucket by the 4-band
    pigeonhole split, and each bucket's state holds the (doc_id, simhash)
    pairs seen so far (16 B/doc/band).  A new arrival is hamming-checked
    against its bucket's history, so recall is DETERMINISTIC for
    hamming <= ``max_hamming`` across the whole stream, exactly like the
    batch operator — a pair found in several shared bands is emitted once
    per band; run ``dropDuplicates(["id_a","id_b"])`` on the sink (or a
    batch ``distinct``) for the deduplicated pair set.  State is
    16 B x docs x bands, sharded over 2^15-ish band buckets — back the
    query with the RocksDB state store at scale.
    """
    import numpy as np
    from pyspark.sql.streaming.state import GroupStateTimeout

    from gorilla_stream_spark.textops import simhash_bands, simhash_hof

    sig = simhash_hof(
        stream_df.select(
            F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
        ),
        text_col="text",
        id_col="doc_id",
    )
    bands = simhash_bands(sig, id_col="doc_id", n_bands=max_hamming + 1)

    def fn(key, pdfs, state):
        import pandas as pd

        blob = state.get[0] if state.exists else b""
        hist = np.frombuffer(blob, dtype=np.int64).reshape(-1, 2).copy() if blob else np.empty((0, 2), np.int64)
        out_a: list[int] = []
        out_b: list[int] = []
        added: list[tuple[int, int]] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("doc_id", kind="stable")
            for did, s in zip(
                pdf["doc_id"].to_numpy(np.int64), pdf["simhash"].to_numpy(np.int64)
            ):
                if hist.shape[0]:
                    x = np.bitwise_xor(hist[:, 1], s).view(np.uint64)
                    if hasattr(np, "bitwise_count"):
                        hd = np.bitwise_count(x)
                    else:  # numpy < 2.0
                        hd = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
                    for j in np.flatnonzero(hd <= max_hamming):
                        a = int(hist[j, 0])
                        if a != int(did):
                            out_a.append(min(a, int(did)))
                            out_b.append(max(a, int(did)))
                hist = np.vstack((hist, np.array([[did, s]], dtype=np.int64)))
                added.append((int(did), int(s)))
        if added:
            state.update((hist.astype(np.int64).tobytes(),))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return bands.groupBy("band_idx", "band_bits").applyInPandasWithState(
        fn,
        outputStructType="id_a long, id_b long",
        stateStructType="seen binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
