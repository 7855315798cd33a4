

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
