"""Wide multi-column layout (widen_multi / narrow_multi): projection
round-trip, subset decode on both layouts, parquet column pruning (the
point of the layout), fsck dispatch, and point lookup."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gorilla_stream_spark.engine import (
    decode_docs_multi,
    decode_multi,
    encode_multi,
    narrow_multi,
    widen_multi,
)
from gorilla_stream_spark.validate import fsck


@pytest.fixture(scope="module")
def src(spark):
    rng = np.random.default_rng(41)
    rows = []
    for i in range(40):
        n = int(rng.integers(5, 60))
        toks = [int(v) for v in rng.integers(0, 50_000, size=n)]
        mask = [1 if j < n - 2 else 0 for j in range(n)]
        rev = toks[::-1]
        rows.append((f"d{i:03d}", toks, mask, rev))
    return spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, mask array<int>, rev array<int>",
    )


@pytest.fixture(scope="module")
def enc(src):
    return encode_multi(src, ["tokens", "mask", "rev"], num_partitions=3).cache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_widen_narrow_round_trip(enc):
    back = narrow_multi(widen_multi(enc))
    assert back.columns == enc.columns
    assert _rows(back) == _rows(enc)


def test_wide_decode_equals_nested(src, enc):
    wide = widen_multi(enc)
    got = _rows(decode_multi(wide, ["tokens", "mask", "rev"]))
    assert got == _rows(decode_multi(enc, ["tokens", "mask", "rev"]))
    assert got == _rows(src)


@pytest.mark.parametrize("layout", ["nested", "wide"])
def test_subset_decode(spark, src, enc, layout):
    table = widen_multi(enc) if layout == "wide" else enc
    # one column, and a reordered pair
    one = decode_multi(table, ["mask"])
    assert one.columns == ["doc_id", "mask"]
    assert _rows(one) == _rows(src.select("doc_id", "mask"))
    pair = decode_multi(table, ["rev", "tokens"])
    assert _rows(pair) == _rows(src.select("doc_id", "rev", "tokens"))


@pytest.mark.parametrize("layout", ["nested", "wide"])
def test_missing_requested_column_raises(enc, layout):
    table = widen_multi(enc) if layout == "wide" else enc
    with pytest.raises(Exception, match="columns"):
        decode_multi(table, ["tokens", "other"]).count()


def test_parquet_prunes_unrequested_buffers(spark, enc, tmp_path):
    """The layout's reason to exist: decoding one column of a persisted
    wide table must not read the other columns' buffer bytes."""
    path = str(tmp_path / "wide")
    widen_multi(enc).write.parquet(path)
    dec = decode_multi(spark.read.parquet(path), ["mask"])
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "buf_mask" in plan
    assert "buf_tokens" not in plan and "buf_rev" not in plan
    assert "lens_tokens" not in plan and "crc32_rev" not in plan


def test_fsck_wide_clean_and_corrupt(spark, enc, tmp_path):
    wide = widen_multi(enc)
    rep = fsck(wide)
    assert rep.filter(~F.col("ok")).count() == 0
    victim = wide.select("block_id").first()["block_id"]
    corrupted = wide.withColumn(
        "buf_rev",
        F.when(
            F.col("block_id") == victim,
            F.concat(F.col("buf_rev"), F.lit(b"\x00")),
        ).otherwise(F.col("buf_rev")),
    )
    bad = fsck(corrupted).filter(~F.col("ok")).collect()
    assert [r["block_id"] for r in bad] == [victim]
    assert "rev" in bad[0]["error"]


def test_point_lookup_on_wide(src, enc):
    wide = widen_multi(enc)
    got = decode_docs_multi(wide, ["tokens", "mask"], ["d003", "d017"])
    assert _rows(got) == _rows(
        src.filter(F.col("doc_id").isin("d003", "d017")).select(
            "doc_id", "tokens", "mask"
        )
    )


def test_narrow_requires_wide(enc):
    with pytest.raises(ValueError, match="buf_"):
        narrow_multi(enc.drop("buffers").drop("codecs"), None)


def test_widen_subset_resolves_by_name(enc, src):
    # widen_multi(enc, ['mask']) must take the MASK slot (index 2), not
    # slot 1 — positional mapping silently relabeled the tokens buffer
    import pyspark.sql.functions as F

    wide = widen_multi(enc, ["mask"])
    dec = decode_multi(wide, token_cols=["mask"])
    got = {r["doc_id"]: list(r["mask"]) for r in dec.collect()}
    want = {r["doc_id"]: list(r["mask"]) for r in src.collect()}
    assert got == want
