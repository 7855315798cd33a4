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
