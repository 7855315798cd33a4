"""End-to-end Spark round-trip: encode -> decode == original, bit-identical.

The core invariant of the reference's suite ("original and decompressed
streams are identical", `/root/reference/test/gorilla_stream/compression/
gorilla_compression_test.exs:136-141`) applied per doc_id on the tokens
table, via a join of decoded against source.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gorilla_stream_spark import decode, encode, estimate
from gorilla_stream_spark.engine import decode_timeseries, encode_timeseries, manifest
from gorilla_stream_spark.generator import tokens_df
from gorilla_stream_spark.skew import skew_stats


@pytest.fixture(scope="module")
def toks(spark):
    df = tokens_df(spark, 600, seed=42)
    df.cache().count()
    return df


def _assert_roundtrip(spark, src_df, enc_df):
    dec = decode(enc_df)
    joined = (
        src_df.alias("s")
        .join(dec.alias("d"), "doc_id", "full_outer")
        .select(
            "doc_id",
            (F.col("s.tokens") == F.col("d.tokens")).alias("same"),
            F.col("s.source") == F.col("d.source"),
        )
    )
    bad = joined.filter(~F.col("same") | F.col("same").isNull())
    assert bad.count() == 0


def test_roundtrip_auto(spark, toks):
    enc = encode(toks, codec="auto", num_partitions=4)
    enc.cache().count()
    _assert_roundtrip(spark, toks, enc)
    # every doc exactly once across blocks
    total_docs = enc.agg(F.sum("n_docs")).first()[0]
    assert total_docs == toks.count()
    # compression must win overall on the fixture mix
    m = enc.agg(F.sum("raw_bytes").alias("r"), F.sum("enc_bytes").alias("e")).first()
    assert m["e"] < m["r"]
    enc.unpersist()


@pytest.mark.parametrize("codec", ["raw", "for", "rle", "dict", "delta", "dod", "fsst"])
def test_roundtrip_fixed_codec(spark, toks, codec):
    small = toks.limit(120)
    enc = encode(small, codec=codec, num_partitions=2)
    _assert_roundtrip(spark, small, enc)
    assert set(r["codec"] for r in enc.select("codec").distinct().collect()) == {codec}


def test_auto_picks_expected_codec_per_stratum(spark, toks):
    enc = encode(
        toks.filter(F.col("source") == "constant"),
        codec="auto",
        num_partitions=1,
        block_tokens=1 << 16,
    )
    codecs = {r["codec"] for r in enc.select("codec").collect()}
    assert codecs <= {"for", "rle", "dict", "fsst"}  # never raw on constant docs


def test_empty_input(spark, toks):
    empty = toks.filter(F.lit(False))
    enc = encode(empty, num_partitions=2)
    assert enc.count() == 0  # empty -> empty (gorilla.ex:74-75)
    assert decode(enc).count() == 0


def test_block_determinism_across_parallelism(spark, toks):
    """Same input -> same blocks regardless of input partitioning (lineage)."""
    a = encode(toks.repartition(7), codec="auto", num_partitions=4)
    b = encode(toks.repartition(3), codec="auto", num_partitions=4)
    ha = sorted(r["crc32_buf"] for r in a.select("crc32_buf").collect())
    hb = sorted(r["crc32_buf"] for r in b.select("crc32_buf").collect())
    assert ha == hb


def test_strict_decode_detects_corruption(spark, toks):
    enc = encode(toks.limit(50), num_partitions=1)
    corrupted = enc.withColumn("crc32_raw", F.col("crc32_raw") + 1)
    with pytest.raises(Exception, match="crc32 mismatch"):
        decode(corrupted, strict=True).count()
    # tolerant mode mirrors the reference's checksum tolerance
    # (decoder/metadata.ex:41-44)
    assert decode(corrupted, strict=False).count() == 50


def test_manifest_and_estimate(spark, toks):
    enc = encode(toks, num_partitions=4)
    man = manifest(enc)
    assert "buffer" not in man.columns
    est = estimate(toks)
    rows = est.collect()
    assert all(r["est_bytes"] > 0 for r in rows)
    # estimator ratio should correlate with reality: overall est within 2x
    est_total = est.agg(F.sum("est_bytes")).first()[0]
    real_total = enc.agg(F.sum("enc_bytes")).first()[0]
    assert 0.5 < est_total / real_total < 2.0


def test_skew_stats_balanced(spark, toks):
    from gorilla_stream_spark.skew import salted_repartition

    stats = skew_stats(salted_repartition(toks, num_partitions=4)).collect()
    rows = [r["rows"] for r in stats]
    tokens = [r["tokens"] for r in stats]
    assert len(rows) == 4  # no empty partitions from salt collisions
    assert max(rows) < 2 * min(rows)  # doc counts hash-uniform
    assert max(tokens) < 6 * min(tokens)  # heavy tail bounded at tiny scale


def test_timeseries_roundtrip(spark):
    import pandas as pd

    rng = np.random.default_rng(7)
    n = 20_000
    ts = 1_609_459_200 + np.cumsum(rng.integers(50, 70, n))
    vals = np.round(np.cumsum(rng.normal(0, 0.5, n)) + 20.0, 2)
    pdf = pd.DataFrame({"ts": ts.astype(np.int64), "value": vals})
    df = spark.createDataFrame(pdf)
    enc = encode_timeseries(df, num_partitions=3)
    dec = decode_timeseries(enc)
    out = dec.orderBy("ts").toPandas()
    src = pdf.sort_values("ts").reset_index(drop=True)
    np.testing.assert_array_equal(out["ts"].to_numpy(), src["ts"].to_numpy())
    np.testing.assert_array_equal(out["value"].to_numpy(), src["value"].to_numpy())
    # compression wins on gauge-like data (reference ratio anchors,
    # docs/performance_guide.md:33-40)
    m = enc.agg(F.sum("raw_bytes").alias("r"), F.sum("enc_bytes").alias("e")).first()
    assert m["e"] < 0.8 * m["r"]


def test_validate_and_clean(spark, toks):
    from gorilla_stream_spark import clean, validate

    dirty = toks.unionByName(toks.limit(3)).unionByName(  # dupes
        spark.createDataFrame(
            [("docBAD", [1, 2], 99, "manual")],
            schema="doc_id string, tokens array<int>, n_tok int, source string",
        )
    )
    issues = validate(dirty)
    kinds = {r["issue"] for r in issues.collect()}
    assert "duplicate_doc_id" in kinds and "n_tok_mismatch" in kinds
    cleaned = clean(dirty)
    assert cleaned.count() == toks.count() + 1  # dupes dropped, n_tok fixed
    assert validate(cleaned).count() == 0


def test_encode_with_container_roundtrip(spark, toks):
    enc = encode(toks, codec="auto", num_partitions=4, container="auto")
    dec = decode(enc)
    joined = toks.alias("s").join(dec.alias("d"), "doc_id", "full_outer")
    bad = joined.filter(
        F.col("s.tokens").isNull()
        | F.col("d.tokens").isNull()
        | (F.col("s.tokens") != F.col("d.tokens"))
    ).count()
    assert bad == 0


def test_analyze_and_recommend(spark, toks):
    from gorilla_stream_spark import analyze_and_recommend

    rec = analyze_and_recommend(toks)
    assert rec["n_docs"] == toks.count()
    assert rec["total_tokens"] > 0
    assert rec["recommended_partitions"] >= 1
    assert 0 < rec["expected_ratio"] <= 1.1
    assert rec["expected_codec_mix"]
    assert rec["skew_handling"] in ("salted_repartition", "uniform_enough")
    assert rec["sampled_vocab"] >= 1
    assert rec["sampled_token_range"] >= rec["sampled_vocab"]
    assert rec["layout_hint"] in ("cluster_for_compression", "salted_repartition")


def test_analyze_recommends_global_dict_for_sparse_vocab(spark):
    """64 huge spread-out token values: rank width (6 bits) beats value
    width (~30 bits) by far — the analyzer must say so."""
    import numpy as np

    from gorilla_stream_spark import analyze_and_recommend

    rng = np.random.default_rng(5)
    vocab = rng.choice(np.arange(1, 2**30), size=64, replace=False)
    rows = [
        (f"d{i}", [int(v) for v in rng.choice(vocab, size=300)], "s")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string"
    ).withColumn("n_tok", F.size("tokens"))
    rec = analyze_and_recommend(df)
    assert rec["recommend_global_dict"] is True
    assert rec["global_dict_saves_bits"] >= 10
    assert rec["sampled_vocab"] == 64


def test_analyze_skips_global_dict_for_dense_vocab(spark):
    """Dense 0..255 vocabulary: a remap cannot shrink widths."""
    import numpy as np

    from gorilla_stream_spark import analyze_and_recommend

    rng = np.random.default_rng(6)
    rows = [
        (f"d{i}", [int(v) for v in rng.integers(0, 256, size=300)], "s")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string"
    ).withColumn("n_tok", F.size("tokens"))
    rec = analyze_and_recommend(df)
    assert rec["recommend_global_dict"] is False
    assert rec["global_dict_saves_bits"] <= 1


def test_decode_docs_prunes_blocks(spark, toks):
    from gorilla_stream_spark import decode_docs, encode

    enc = encode(toks, codec="auto", num_partitions=4, block_tokens=1 << 14).cache()
    try:
        ids = [r["doc_id"] for r in toks.limit(3).collect()]
        out = decode_docs(enc, ids).collect()
        assert sorted(r["doc_id"] for r in out) == sorted(ids)
        src = {r["doc_id"]: list(r["tokens"]) for r in toks.filter(F.col("doc_id").isin(ids)).collect()}
        for r in out:
            assert list(r["tokens"]) == src[r["doc_id"]]
        # pruning actually happened: fewer blocks touched than exist
        n_blocks = enc.count()
        touched = enc.filter(
            F.arrays_overlap(F.col("doc_ids"), F.array(*[F.lit(d) for d in ids]))
        ).count()
        assert touched < n_blocks
    finally:
        enc.unpersist()


def test_read_timerange_prunes_blocks(spark):
    import pandas as pd

    from gorilla_stream_spark import read_timerange
    from gorilla_stream_spark.engine import encode_timeseries

    n = 50_000
    pdf = pd.DataFrame({"ts": np.arange(n, dtype=np.int64) * 60, "value": np.arange(n) * 0.5})
    enc = encode_timeseries(spark.createDataFrame(pdf), num_partitions=8).cache()
    try:
        lo, hi = 60 * 1000, 60 * 1999
        out = read_timerange(enc, lo, hi).orderBy("ts").toPandas()
        assert len(out) == 1000
        assert out["ts"].iloc[0] == lo and out["ts"].iloc[-1] == hi
        np.testing.assert_array_equal(out["value"].to_numpy(), (out["ts"] // 60 * 0.5).to_numpy())
        pruned = enc.filter((F.col("ts_max") >= lo) & (F.col("ts_min") <= hi)).count()
        assert pruned < enc.count()  # manifest pruning skipped blocks
    finally:
        enc.unpersist()


def test_giant_doc_skew_bounded_blocks(spark):
    # north-rule skew story: one 1M-token doc among tiny docs must not blow
    # a single block; it forms its own block(s) and round-trips exactly
    import pandas as pd

    from gorilla_stream_spark import decode, encode

    rng = np.random.default_rng(5)
    docs = [("tiny%d" % i, rng.integers(0, 100, 50).astype(np.int32), "t") for i in range(200)]
    giant = rng.integers(0, 50000, 1_000_000).astype(np.int32)
    docs.append(("giant", giant, "g"))
    pdf = pd.DataFrame(
        {
            "doc_id": [d[0] for d in docs],
            "tokens": [d[1] for d in docs],
            "n_tok": [len(d[1]) for d in docs],
            "source": [d[2] for d in docs],
        }
    )
    df = spark.createDataFrame(pdf)
    enc = encode(df, codec="auto", num_partitions=4, block_tokens=1 << 17).cache()
    try:
        assert enc.filter(F.col("n_tokens") > (1 << 17) + 1_000_000).count() == 0
        dec = decode(enc)
        g = dec.filter(F.col("doc_id") == "giant").first()
        np.testing.assert_array_equal(np.asarray(g["tokens"], dtype=np.int32), giant)
        assert dec.count() == 201
    finally:
        enc.unpersist()


def test_enc_us_metrics_recorded(spark, toks):
    from gorilla_stream_spark import encode, manifest

    man = manifest(encode(toks, codec="auto", num_partitions=4))
    rows = man.select("enc_us").collect()
    assert all(r["enc_us"] >= 0 for r in rows)
    assert any(r["enc_us"] > 0 for r in rows)


def test_corrupted_buffer_fails_fast(spark, toks):
    from gorilla_stream_spark import decode, encode

    enc = encode(toks, codec="auto", num_partitions=2)
    # flip a byte inside the payload: strict decode must fail on the buffer
    # crc BEFORE any codec kernel touches the bytes
    bad = enc.withColumn(
        "buffer",
        F.concat(
            F.expr("substring(buffer, 1, 20)"),
            F.lit(bytes([0xFF])),
            F.expr("substring(buffer, 22, octet_length(buffer))"),
        ),
    )
    with pytest.raises(Exception, match="buffer crc32 mismatch"):
        decode(bad, strict=True).count()


def test_null_tokens_fail_loudly(spark):
    # a NULL tokens cell must raise, not silently corrupt offsets/crc
    from gorilla_stream_spark import encode

    df = spark.createDataFrame(
        [("a", [1, 2, 3], 3, "s"), ("b", None, 0, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    with pytest.raises(Exception, match="NULL tokens"):
        encode(df, codec="auto", num_partitions=1).count()


def test_decode_docs_empty_list(spark, toks):
    from gorilla_stream_spark import decode_docs, encode

    enc = encode(toks, codec="auto", num_partitions=2)
    assert decode_docs(enc, []).count() == 0


def test_null_token_element_fails_loudly(spark):
    # a NULL *element* inside a tokens array must raise, not silently become
    # INT64_MIN garbage via the NaN cast
    from gorilla_stream_spark import encode

    df = spark.createDataFrame(
        [("a", [1, None, 3], 3, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    with pytest.raises(Exception, match="NULL token element"):
        encode(df, codec="auto", num_partitions=1).count()


def test_analyze_empty_input(spark):
    from gorilla_stream_spark import analyze_and_recommend

    df = spark.createDataFrame(
        [], "doc_id string, tokens array<int>, n_tok int, source string"
    )
    rec = analyze_and_recommend(df)
    assert rec["n_docs"] == 0
    assert rec["recommended_partitions"] == 1


def test_multi_column_roundtrip(spark, toks):
    from gorilla_stream_spark.engine import decode_multi, encode_multi

    # second column: per-doc attention-mask-like runs (RLE-friendly), third:
    # reversed tokens — each column should pick its own codec
    src = toks.select(
        "doc_id",
        "tokens",
        F.expr("transform(tokens, (t, i) -> CASE WHEN i < size(tokens) - 3 THEN 1 ELSE 0 END)")
        .cast("array<int>").alias("mask"),
        F.reverse("tokens").alias("rev"),
    )
    enc = encode_multi(src, ["tokens", "mask", "rev"], num_partitions=3)
    enc.cache()
    # per-column codec independence: mask must RLE/for-collapse
    mixes = {tuple(r["codecs"]) for r in enc.select("codecs").collect()}
    assert all(len(m) == 3 for m in mixes)
    dec = decode_multi(enc, ["tokens", "mask", "rev"])
    j = src.alias("s").join(dec.alias("d"), "doc_id")
    bad = j.filter(
        (F.col("s.tokens") != F.col("d.tokens"))
        | (F.col("s.mask") != F.col("d.mask"))
        | (F.col("s.rev") != F.col("d.rev"))
    ).count()
    assert bad == 0
    assert dec.count() == src.count()
    # crc gate per column
    corrupted = enc.withColumn(
        "crc32_bufs", F.expr("transform(crc32_bufs, c -> c + 1)")
    )
    with pytest.raises(Exception, match="crc32 mismatch"):
        decode_multi(corrupted, ["tokens", "mask", "rev"]).count()


def test_multi_column_wrong_cols_fails(spark, toks):
    from gorilla_stream_spark.engine import decode_multi, encode_multi

    enc = encode_multi(toks.select("doc_id", "tokens"), ["tokens"], num_partitions=2)
    with pytest.raises(Exception, match="expected"):
        decode_multi(enc, ["tokens", "other"]).count()


def test_encode_timeseries_assume_sorted_parity(spark):
    # the shuffle-free ingest path must decode to the same multiset of
    # points as the range-partitioned path
    from pyspark.sql import functions as F

    from gorilla_stream_spark.engine import decode_timeseries, encode_timeseries

    ev = spark.range(20000).select(
        (F.lit(1000) + F.col("id") * 7).alias("ts"),
        F.round(F.sin(F.col("id") / 100.0), 4).alias("value"),
    )
    agg = [
        F.count("*").alias("n"),
        F.sum("ts").alias("s"),
        F.sum(F.round(F.col("value") * 10000).cast("long")).alias("v"),
    ]
    a = decode_timeseries(encode_timeseries(ev, assume_sorted=True)).agg(*agg).first()
    b = decode_timeseries(encode_timeseries(ev, num_partitions=4)).agg(*agg).first()
    assert tuple(a) == tuple(b)


def test_decode_docs_multi_point_lookup(spark):
    from pyspark.sql import functions as F

    from gorilla_stream_spark.engine import decode_docs_multi, encode_multi
    from gorilla_stream_spark.generator import tokens_df

    src = tokens_df(spark, 150, seed=13).select(
        "doc_id",
        "tokens",
        F.expr("transform(tokens, t -> t % 2)").cast("array<int>").alias("mask"),
    )
    enc = encode_multi(src, ["tokens", "mask"], num_partitions=3).cache()
    wanted = [r.doc_id for r in src.limit(3).collect()]
    dec = decode_docs_multi(enc, ["tokens", "mask"], wanted)
    got = {r.doc_id: (list(r.tokens), list(r.mask)) for r in dec.collect()}
    want = {
        r.doc_id: (list(r.tokens), list(r.mask))
        for r in src.filter(F.col("doc_id").isin(wanted)).collect()
    }
    assert got == want and len(got) == 3
    # empty lookup is a clean empty frame
    assert decode_docs_multi(enc, ["tokens", "mask"], []).count() == 0


def test_encode_rejects_out_of_int32_tokens(spark):
    # a bigint tokens column holding 2^31 must fail loud: the raw-bytes
    # lineage and decode output are int32, so a silent wrap would
    # round-trip corrupted data with green CRCs
    import pyspark.sql.functions as F

    from gorilla_stream_spark import encode

    df = spark.range(3).select(
        F.col("id").cast("string").alias("doc_id"),
        F.array(F.lit(2**31).cast("long"), F.lit(5).cast("long")).alias("tokens"),
        F.lit("s").alias("source"),
    )
    with pytest.raises(Exception, match="int32"):
        encode(df, num_partitions=1).collect()
    # in-range bigint tokens encode fine (type widened, values preserved)
    ok = spark.range(3).select(
        F.col("id").cast("string").alias("doc_id"),
        F.array(F.lit(7).cast("long"), F.lit(9).cast("long")).alias("tokens"),
        F.lit("s").alias("source"),
    )
    from gorilla_stream_spark import decode

    rows = decode(encode(ok, num_partitions=1)).collect()
    assert all(list(r.tokens) == [7, 9] for r in rows)


def test_compact_blocks_roundtrip_and_fill(spark, toks):
    from gorilla_stream_spark import compact_blocks

    # tiny blocks simulate a fragmented streaming-ingest table
    enc = encode(toks, num_partitions=8, block_tokens=400)
    enc.cache()
    n_before = enc.count()
    comp = compact_blocks(enc, block_tokens=8000, num_partitions=2)
    comp.cache()
    n_after = comp.count()
    assert n_after < n_before / 4, (n_before, n_after)
    # decoded content identical to the source, bit-for-bit
    _assert_roundtrip(spark, toks, comp)
    # block_id unique across passthrough + compacted rows
    assert comp.select("block_id").distinct().count() == n_after
    # conservation: token count and doc count preserved exactly
    a = enc.agg(F.sum("n_tokens"), F.sum("n_docs")).first()
    b = comp.agg(F.sum("n_tokens"), F.sum("n_docs")).first()
    assert tuple(a) == tuple(b)


def test_compact_blocks_passthrough_untouched(spark, toks):
    from gorilla_stream_spark import compact_blocks
    from gorilla_stream_spark.engine import _COMPACT_PART_BASE

    enc = encode(toks, num_partitions=4, block_tokens=3000).cache()
    # min_tokens=1 -> nothing qualifies as small; table must be byte-identical
    same = compact_blocks(enc, block_tokens=3000, min_tokens=1)
    assert same.count() == enc.count()
    assert (
        same.select("block_id", F.crc32(F.col("buffer")).alias("c"))
        .exceptAll(enc.select("block_id", F.crc32(F.col("buffer")).alias("c")))
        .count()
        == 0
    )
    # with a real threshold, passthrough rows keep their ids; merged rows
    # live in the reserved part_id namespace
    comp = compact_blocks(enc, block_tokens=12000, num_partitions=2).cache()
    merged = comp.filter(F.col("part_id") >= _COMPACT_PART_BASE)
    kept = comp.filter(F.col("part_id") < _COMPACT_PART_BASE)
    assert merged.count() > 0
    assert kept.join(enc, "block_id").count() == kept.count()


def test_compact_blocks_preserves_extra_columns(spark, toks):
    # checkpointed tables carry config_fp etc. — passthrough rows keep the
    # value, merged rows get NULL (their sources may span fingerprints)
    from gorilla_stream_spark import compact_blocks

    enc = encode(toks, num_partitions=4, block_tokens=500).withColumn(
        "config_fp", F.lit("fp0")
    )
    comp = compact_blocks(enc, block_tokens=12000, num_partitions=2).cache()
    assert "config_fp" in comp.columns
    merged = comp.filter(F.col("part_id") >= (1 << 20))
    assert merged.filter(F.col("config_fp").isNotNull()).count() == 0
    kept = comp.filter(F.col("part_id") < (1 << 20))
    assert kept.filter(F.col("config_fp") != "fp0").count() == 0
    _assert_roundtrip(spark, toks, comp.drop("config_fp"))


def test_compact_blocks_detects_corruption(spark, toks):
    from gorilla_stream_spark import compact_blocks

    enc = encode(toks, num_partitions=2, block_tokens=500)
    bad = enc.withColumn("crc32_raw", F.col("crc32_raw") + 1)
    with pytest.raises(Exception, match="crc32"):
        compact_blocks(bad, block_tokens=8000).filter(
            F.col("part_id") >= (1 << 20)
        ).count()


def test_decode_docs_on_legacy_table_without_id_bounds(spark, toks):
    # tables written before id_min/id_max existed must still point-lookup
    from gorilla_stream_spark.engine import decode_docs

    enc = encode(toks, num_partitions=2, block_tokens=2000)
    legacy = enc.drop("id_min", "id_max")
    want = ["doc00000011", "doc00000023"]
    got = {r.doc_id for r in decode_docs(legacy, want).collect()}
    assert got == set(want)
    # and the bounds themselves are consistent with the doc_ids manifest
    bad = enc.filter(
        (F.col("id_min") != F.array_min("doc_ids"))
        | (F.col("id_max") != F.array_max("doc_ids"))
    ).count()
    assert bad == 0


def test_compact_blocks_rerun_keeps_block_ids_unique(spark, toks):
    # periodic maintenance: run 1's merged survivors pass through run 2,
    # which must allocate NEW part_ids above them — never reuse (base, seq)
    from gorilla_stream_spark import compact_blocks

    enc = encode(toks, num_partitions=4, block_tokens=500)
    run1 = compact_blocks(enc, block_tokens=6000, num_partitions=2)
    # new streaming debris arrives after the first compaction
    more = encode(toks.limit(200), num_partitions=2, block_tokens=400).withColumn(
        "doc_id_salt", F.lit(1)
    ).drop("doc_id_salt")
    table = run1.unionByName(more)
    run2 = compact_blocks(table, block_tokens=6000, num_partitions=2).cache()
    n = run2.count()
    assert run2.select("block_id").distinct().count() == n
    # run 2's merged rows sit strictly above run 1's part_ids
    prev_max = table.agg(F.max("part_id")).first()[0]
    assert run2.filter(F.col("part_id") > prev_max).count() > 0


def test_decode_docs_mixed_null_bounds_not_dropped(spark, toks):
    # passthrough rows of a pre-bounds table get NULL id_min/id_max after
    # compaction union — point lookups must still find their docs
    from gorilla_stream_spark import compact_blocks
    from gorilla_stream_spark.engine import decode_docs

    legacy = encode(toks, num_partitions=2, block_tokens=4000).drop("id_min", "id_max")
    comp = compact_blocks(legacy, block_tokens=8000, min_tokens=2000).cache()
    assert "id_min" in comp.columns
    # docs living in passthrough (NULL-bounds) blocks
    null_blocks = comp.filter(F.col("id_min").isNull())
    assert null_blocks.count() > 0
    some = null_blocks.select(F.explode("doc_ids").alias("d")).limit(2).collect()
    want = [r.d for r in some]
    got = {r.doc_id for r in decode_docs(comp, want).collect()}
    assert got == set(want)


def test_compact_blocks_with_zero_token_docs(spark):
    # zero-length token arrays must survive compaction with aligned
    # accumulators (the pending tail can be all-zero-token docs)
    from gorilla_stream_spark import compact_blocks, decode

    rows = [(f"d{i:04d}", [] if i % 3 == 0 else list(range(i % 50)), "s") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, source string")
    enc = encode(df, num_partitions=2, block_tokens=64)
    comp = compact_blocks(enc, block_tokens=2000, num_partitions=1)
    dec = decode(comp)
    assert dec.count() == 300
    bad = (
        df.alias("s").join(dec.alias("d"), "doc_id")
        .filter(F.col("s.tokens") != F.col("d.tokens")).count()
    )
    assert bad == 0


def test_compact_blocks_preserves_container(spark, toks):
    from gorilla_stream_spark import compact_blocks

    enc = encode(toks, num_partitions=2, block_tokens=800, container="zlib")
    comp = compact_blocks(enc, block_tokens=8000, container="zlib").cache()
    merged = comp.filter(F.col("part_id") >= (1 << 20))
    assert merged.count() > 0
    _assert_roundtrip(spark, toks, comp)


def test_encode_part_base_namespaces_append_runs(spark, toks):
    # batch append: run 2 encodes with part_base above run 1's max part_id,
    # so the unioned table keeps block_id unique
    run1 = encode(toks.limit(300), num_partitions=2, block_tokens=2000)
    base = int(run1.agg(F.max("part_id")).first()[0]) + 1
    run2 = encode(toks, num_partitions=2, block_tokens=2000, part_base=base)
    table = run1.unionByName(run2).cache()
    assert table.select("block_id").distinct().count() == table.count()
    assert run2.agg(F.min("part_id")).first()[0] >= base
