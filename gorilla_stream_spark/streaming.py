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

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gorilla_stream_spark.engine import DEFAULT_BLOCK_TOKENS, encode

__all__ = ["encode_stream"]


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
    committed_marker = os.path.join(checkpoint_dir, "committed_batches")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(committed_marker, str(batch_id))
        if os.path.exists(marker):  # replayed batch already fully committed
            return
        enc = encode(
            batch_df,
            codec=codec,
            num_partitions=num_partitions,
            block_tokens=block_tokens,
        ).withColumn("batch_id", F.lit(batch_id))
        enc.write.mode("append").option("compression", "zstd").parquet(output_path)
        os.makedirs(committed_marker, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write("ok")

    writer = stream_df.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", os.path.join(checkpoint_dir, "spark")
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
            pdf = pdf.sort_values("doc_id", kind="stable")
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
