

def test_fsck_blocks_reports_without_raising(spark):
    import pyspark.sql.functions as F

    from gorilla_stream_spark import encode
    from gorilla_stream_spark.generator import tokens_df
    from gorilla_stream_spark.validate import fsck_blocks

    enc = encode(tokens_df(spark, 200, seed=9), num_partitions=2, block_tokens=2000).cache()
    clean_report = fsck_blocks(enc)
    assert clean_report.filter(~F.col("ok")).count() == 0
    # corrupt one block's buffer: fsck flags exactly that block, keeps going
    first_id = enc.first().block_id
    bad = enc.withColumn(
        "buffer",
        F.when(F.col("block_id") == first_id, F.lit(b"\x00garbage")).otherwise(F.col("buffer")),
    )
    rep = fsck_blocks(bad).cache()
    assert rep.count() == enc.count()
    flagged = rep.filter(~F.col("ok")).collect()
    assert len(flagged) == 1 and flagged[0].block_id == first_id
    assert flagged[0].error
    # manifest lie (wrong n_tokens) is also caught
    lie = enc.withColumn(
        "n_tokens",
        F.when(F.col("block_id") == first_id, F.col("n_tokens") + 1).otherwise(F.col("n_tokens")),
    )
    bad2 = fsck_blocks(lie).filter(~F.col("ok")).collect()
    assert len(bad2) == 1 and "mismatch" in bad2[0].error


def test_fsck_dispatch_all_table_kinds(spark):
    import numpy as np
    import pyspark.sql.functions as F

    from gorilla_stream_spark import encode, encode_multi, encode_timeseries
    from gorilla_stream_spark.gorilla_wire import encode_timeseries_wire
    from gorilla_stream_spark.generator import tokens_df
    from gorilla_stream_spark.validate import fsck
    from gorilla_stream_spark.vectors import encode_vectors

    toks = tokens_df(spark, 120, seed=4).cache()
    kinds = {}
    kinds["tokens"] = encode(toks, num_partitions=2, block_tokens=2000)
    kinds["multi"] = encode_multi(
        toks.withColumn("mask", F.expr("transform(tokens, t -> 1)")),
        ["tokens", "mask"], num_partitions=2,
    )
    rng = np.random.default_rng(0)
    vec = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    kinds["vectors"] = encode_vectors(vec, num_partitions=2)
    ts = spark.range(5000).select(
        (F.col("id") * 1000).alias("ts"), (F.col("id") * 0.5).alias("value")
    )
    kinds["timeseries"] = encode_timeseries(ts, num_partitions=2)
    kinds["wire"] = encode_timeseries_wire(ts, num_partitions=2)
    for name, tab in kinds.items():
        rep = fsck(tab)
        bad = rep.filter(~F.col("ok")).collect()
        assert not bad, (name, bad)
        assert rep.count() > 0, name


def test_fsck_timeseries_flags_manifest_lie(spark):
    import pyspark.sql.functions as F

    from gorilla_stream_spark import encode_timeseries
    from gorilla_stream_spark.validate import fsck

    ts = spark.range(5000).select(
        (F.col("id") * 1000).alias("ts"), (F.col("id") * 0.5).alias("value")
    )
    enc = encode_timeseries(ts, num_partitions=1)
    # a wrong ts_min silently breaks read_timerange pruning — fsck flags it
    lie = enc.withColumn("ts_min", F.col("ts_min") + 1)
    bad = fsck(lie).filter(~F.col("ok")).collect()
    assert bad and "pruning manifest" in bad[0].error


def test_fsck_dict_container_table(spark):
    import pyspark.sql.functions as F

    from gorilla_stream_spark import encode
    from gorilla_stream_spark.codecs import train_container_dict
    from gorilla_stream_spark.validate import fsck

    docs = spark.range(60).select(
        F.col("id").cast("string").alias("doc_id"),
        F.expr("transform(sequence(1, 30), i -> cast((id + i) % 64 as int))").alias("tokens"),
        F.lit("s").alias("source"),
    )
    sample = [bytes(r.buffer) for r in encode(docs.limit(8), num_partitions=1).collect()]
    d = train_container_dict(sample)
    enc = encode(docs, num_partitions=1, container="zlib-dict", container_dict=d).cache()
    # without the dict every block reads undecodable; with it all green
    bad_without = fsck(enc).filter(~F.col("ok")).count()
    assert bad_without == enc.count()
    assert fsck(enc, container_dict=d).filter(~F.col("ok")).count() == 0
