"""Job CLI subcommands for the round-2 operators (in-process main())."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from gorilla_stream_spark import jobs

SF = "/root/testdata/sf0.001"


def test_dedup_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    dirty = docs.unionByName(
        docs.filter(F.col("doc_id") < 10).withColumn("doc_id", F.col("doc_id") + 9000)
    )
    dirty.write.parquet(src)
    assert jobs.main(["dedup", "--input", src, "--output", out]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["removed"] == 10 and m["rows_out"] == 500


def test_vector_cli_roundtrip(spark, tmp_path, capsys):
    enc = str(tmp_path / "venc")
    dec = str(tmp_path / "vdec")
    assert jobs.main([
        "encode-vectors", "--input", f"{SF}/embeddings.parquet", "--output", enc,
        "--partitions", "2", "--layout", "lsh",
    ]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["ratio"] is not None and m["blocks"] >= 1
    assert jobs.main(["decode-vectors", "--input", enc, "--output", dec]) == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2["rows"] == 500
    src = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = spark.read.parquet(dec)
    bad = (
        src.alias("s").join(got.alias("d"), "vec_id")
        .filter(F.col("s.embedding") != F.col("d.embedding")).count()
    )
    assert bad == 0


def test_neardup_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "ndsrc")
    out = str(tmp_path / "ndout")
    spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text").write.parquet(src)
    assert jobs.main(["neardup", "--input", src, "--output", out, "--threshold", "70"]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["pairs"] >= 1  # sf0.001 documents contain planted near-dups


def test_ann_cli(spark, tmp_path, capsys):
    enc = str(tmp_path / "aenc")
    qsrc = str(tmp_path / "aq")
    out = str(tmp_path / "aout")
    assert jobs.main([
        "encode-vectors", "--input", f"{SF}/embeddings.parquet", "--output", enc,
        "--partitions", "2", "--layout", "lsh",
    ]) == 0
    capsys.readouterr()
    spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.col("vec_id") < 2).write.parquet(qsrc)
    assert jobs.main(["ann", "--input", enc, "--queries", qsrc, "--output", out, "--k", "5"]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["queries"] == 2 and m["results"] <= 10
    got = spark.read.parquet(out)
    # self-match must rank first with the max score
    for r in got.filter(F.col("rank") == 1).collect():
        assert r.query_id == r.vec_id


def test_encode_multi_cli_roundtrip(spark, tmp_path, capsys):
    src = str(tmp_path / "msrc")
    enc = str(tmp_path / "menc")
    dec = str(tmp_path / "mdec")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr("transform(split(text,''), c -> ascii(c))").cast("array<int>").alias("tokens"),
        F.expr("transform(split(text,''), c -> CASE WHEN c = ' ' THEN 0 ELSE 1 END)")
        .cast("array<int>").alias("mask"),
    )
    toks.write.parquet(src)
    assert jobs.main([
        "encode-multi", "--input", src, "--output", enc,
        "--columns", "tokens,mask", "--partitions", "2",
    ]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["columns"] == ["tokens", "mask"] and m["ratio"] < 1
    assert jobs.main([
        "decode-multi", "--input", enc, "--output", dec, "--columns", "tokens,mask",
    ]) == 0
    got = spark.read.parquet(dec)
    j = toks.alias("s").join(got.alias("d"), "doc_id")
    assert j.count() == toks.count()
    bad = j.filter(
        (F.col("s.tokens") != F.col("d.tokens")) | (F.col("s.mask") != F.col("d.mask"))
    ).count()
    assert bad == 0


def test_info_cli_header_only(spark, tmp_path, capsys):
    from gorilla_stream_spark import encode
    from gorilla_stream_spark.generator import tokens_df

    enc_path = str(tmp_path / "ienc")
    src = tokens_df(spark, 120, seed=8)
    encode(src, codec="auto", num_partitions=2).write.parquet(enc_path)
    assert jobs.main(["info", "--input", enc_path]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["docs"] == 120 and m["ratio"] < 1 and m["blocks"] >= 1
    assert sum(m["codec_mix"].values()) == m["blocks"]


def test_cli_wire_export_import_roundtrip(spark, tmp_path):
    import pyspark.sql.functions as F

    from gorilla_stream_spark import jobs
    from gorilla_stream_spark.gorilla_wire import wire_info

    src = str(tmp_path / "wire_src")
    enc = str(tmp_path / "wire_enc")
    out = str(tmp_path / "wire_out")
    n = 12_345
    spark.range(n).select(
        (F.lit(1_600_000_000) + F.col("id") * 30).alias("ts"),
        (F.col("id") % 9).cast("double").alias("value"),
    ).write.parquet(src)
    rc = jobs.main(
        ["wire-export", "--input", src, "--output", enc, "--partitions", "2"]
    )
    assert rc == 0
    blocks = spark.read.parquet(enc).collect()
    assert sum(r["n_points"] for r in blocks) == n
    # every block is a valid reference-format binary
    for r in blocks[:3]:
        assert wire_info(bytes(r["buffer"]))["count"] == r["n_points"]
    rc = jobs.main(["wire-import", "--input", enc, "--output", out])
    assert rc == 0
    dec = spark.read.parquet(out)
    assert dec.count() == n
    assert dec.agg(F.min("ts")).first()[0] == 1_600_000_000


def test_cli_pack(spark, tmp_path):
    import pyspark.sql.functions as F

    from gorilla_stream_spark import jobs

    src = str(tmp_path / "pk_src")
    out = str(tmp_path / "pk_out")
    spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.expr("transform(sequence(1, 37), i -> cast(i as int))").alias("tokens"),
    ).write.parquet(src)
    rc = jobs.main(["pack", "--input", src, "--output", out, "--seq-len", "64"])
    assert rc == 0
    packed = spark.read.parquet(out)
    assert packed.agg(F.sum("n_tok")).first()[0] == 100 * 37
    full = packed.filter(F.col("n_tok") == 64).count()
    assert full == (100 * 37) // 64


def test_cli_compact_and_fsck(spark, tmp_path, capsys):
    from gorilla_stream_spark import encode
    from gorilla_stream_spark.generator import tokens_df

    enc_path, out = str(tmp_path / "enc"), str(tmp_path / "comp")
    encode(tokens_df(spark, 150, seed=31), num_partitions=2, block_tokens=600).write.parquet(
        enc_path
    )
    assert jobs.main([
        "compact", "--input", enc_path, "--output", out, "--block-tokens", "8000",
    ]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["blocks_after"] < m["blocks_before"] and m["blocks_merged_into"] > 0
    assert jobs.main(["fsck", "--input", out]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["bad"] == 0 and m["blocks"] > 0


def test_cli_decontaminate_and_sample(spark, tmp_path, capsys):
    src = str(tmp_path / "docs")
    spark.read.parquet(f"{SF}/documents.parquet").write.parquet(src)
    tr, ev = str(tmp_path / "tr"), str(tmp_path / "ev")
    docs = spark.read.parquet(src)
    docs.filter(F.col("doc_id") % 5 != 0).write.parquet(tr)
    docs.filter(F.col("doc_id") % 5 == 0).write.parquet(ev)
    pairs, clean = str(tmp_path / "pairs"), str(tmp_path / "clean")
    assert jobs.main([
        "decontaminate", "--train", tr, "--eval", ev,
        "--output", pairs, "--cleaned", clean,
    ]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["pairs"] > 0
    assert m["train_docs_kept"] + m["train_docs_flagged"] == spark.read.parquet(tr).count()
    sout = str(tmp_path / "sampled")
    assert jobs.main([
        "sample", "--input", src, "--output", sout, "--fraction", "0.3",
    ]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < m["rows_out"] < m["rows_in"]


def _mk_tokens(spark, path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr("transform(split(text,''), c -> ascii(c))").cast("array<int>").alias("tokens"),
        "source",
    ).withColumn("n_tok", F.size("tokens").cast("int"))
    toks.write.mode("overwrite").parquet(path)


def test_index_and_grep_token_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "toksrc")
    enc = str(tmp_path / "tenc")
    idx = str(tmp_path / "tidx")
    hits = str(tmp_path / "thits")
    _mk_tokens(spark, src)
    assert jobs.main([
        "encode", "--input", src, "--output", enc,
        "--checkpoint", str(tmp_path / "ck"), "--partitions", "2",
    ]) == 0
    capsys.readouterr()
    assert jobs.main(["index", "--encoded", enc, "--output", idx]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["blocks"] >= 1
    assert jobs.main([
        "grep-token", "--encoded", enc, "--index", idx,
        "--token", "113", "--output", hits,
    ]) == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # truth by direct scan
    truth = (
        spark.read.parquet(src)
        .filter(F.array_contains("tokens", 113)).count()
    )
    assert m2["docs"] == truth and m2["candidate_blocks"] <= m2["total_blocks"]
    # absent token: zone map prunes everything, zero docs
    assert jobs.main([
        "grep-token", "--encoded", enc, "--index", idx, "--token", "-7",
    ]) == 0
    m3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m3["docs"] == 0 and m3["candidate_blocks"] == 0


def test_build_dict_and_remap_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "vsrc")
    d = str(tmp_path / "vdict")
    out = str(tmp_path / "vout")
    back = str(tmp_path / "vback")
    _mk_tokens(spark, src)
    assert jobs.main(["build-dict", "--input", src, "--output", d]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["vocab"] >= 20  # ascii char vocab
    assert jobs.main(["remap", "--input", src, "--dict", d, "--output", out]) == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2["rows"] == 500
    assert jobs.main([
        "remap", "--input", out, "--dict", d, "--output", back, "--inverse",
    ]) == 0
    capsys.readouterr()
    srcdf = spark.read.parquet(src)
    backdf = spark.read.parquet(back)
    bad = (
        srcdf.alias("s").join(backdf.alias("b"), "doc_id")
        .filter(F.col("s.tokens") != F.col("b.tokens")).count()
    )
    assert bad == 0


def test_grep_phrase_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "psrc")
    enc = str(tmp_path / "penc")
    idx = str(tmp_path / "pidx")
    _mk_tokens(spark, src)
    assert jobs.main([
        "encode", "--input", src, "--output", enc,
        "--checkpoint", str(tmp_path / "pck"), "--partitions", "2",
    ]) == 0
    capsys.readouterr()
    assert jobs.main(["index", "--encoded", enc, "--output", idx]) == 0
    capsys.readouterr()
    # phrase "scan" as char tokens
    assert jobs.main([
        "grep-token", "--encoded", enc, "--index", idx,
        "--phrase", "115,99,97,110",
    ]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    truth = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.expr("contains(text, 'scan')")
    ).count()
    assert m["docs"] == truth and m["phrase"] == [115, 99, 97, 110]


def test_drift_cli(spark, tmp_path, capsys):
    a = str(tmp_path / "da")
    b = str(tmp_path / "db")
    out = str(tmp_path / "dout")
    spark.createDataFrame(
        [("a1", [1, 1, 2], "s")], "doc_id string, tokens array<int>, source string"
    ).write.parquet(a)
    spark.createDataFrame(
        [("b1", [2, 3], "s")], "doc_id string, tokens array<int>, source string"
    ).write.parquet(b)
    assert jobs.main(["drift", "--a", a, "--b", b, "--output", out]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m == {"tokens": 3, "appeared": 1, "vanished": 1}


def test_merge_and_transcode_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "mtsrc")
    ea = str(tmp_path / "mtea")
    eb = str(tmp_path / "mteb")
    merged = str(tmp_path / "mtm")
    tout = str(tmp_path / "mtt")
    _mk_tokens(spark, src)
    for half, out in ((0, ea), (1, eb)):
        half_src = str(tmp_path / f"half{half}")
        spark.read.parquet(src).filter(
            F.col("doc_id").cast("long") % 2 == half
        ).write.parquet(half_src)
        assert jobs.main([
            "encode", "--input", half_src, "--output", out,
            "--checkpoint", str(tmp_path / f"ck{half}"), "--partitions", "2",
        ]) == 0
    capsys.readouterr()
    assert jobs.main(["merge", "--a", ea, "--b", eb, "--output", merged]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["ok"] is True and m["docs"] == 500
    assert jobs.main([
        "transcode", "--input", merged, "--output", tout,
        "--codec", "dod", "--container", "zlib",
    ]) == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2["blocks"] == m["blocks"] and 0 < m2["ratio"] <= 1.2
    assert jobs.main(["verify", "--source", src, "--encoded", tout]) == 0
    m3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m3["ok"] is True


def test_dup_spans_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "dtoks")
    spans = str(tmp_path / "dspans")
    stripped = str(tmp_path / "dstrip")
    _mk_tokens(spark, src)
    assert jobs.main([
        "dup-spans", "--input", src, "--output", spans,
        "--strip-output", stripped, "--k", "8",
    ]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["docs_with_dups"] > 0 and m["dup_tokens"] > 0 and m["stripped"]
    out = spark.read.parquet(stripped)
    src_df = spark.read.parquet(src)
    assert out.count() == src_df.count()
    # stripping removed tokens overall, but kept the canonical copies
    n_src = src_df.agg(F.sum(F.size("tokens"))).collect()[0][0]
    n_out = out.agg(F.sum(F.size("tokens"))).collect()[0][0]
    assert 0 < n_src - n_out < m["dup_tokens"] * 2
    # a second pass with keep-first finds nothing left to strip
    spans2 = str(tmp_path / "dspans2")
    assert jobs.main([
        "dup-spans", "--input", stripped, "--output", spans2,
        "--keep-first", "--k", "8",
    ]) == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # removal can glue unrelated contexts into a few NEW duplicate windows
    # (the iterative-dedup effect); the residue must be tiny, not zero
    assert m2["dup_tokens"] < m["dup_tokens"] * 0.05


def test_incremental_encode_cli(spark, tmp_path, capsys):
    old_src = str(tmp_path / "iold")
    new_src = str(tmp_path / "inew")
    old_enc = str(tmp_path / "ienc")
    out = str(tmp_path / "iinc")
    _mk_tokens(spark, old_src)
    # new snapshot: drop doc_id%11==0, append a token where %5==0
    o = spark.read.parquet(old_src)
    did = F.col("doc_id").cast("long")
    n = o.filter(did % 11 != 0).withColumn(
        "tokens",
        F.when(did % 5 == 0, F.concat("tokens", F.array(F.lit(9)))).otherwise(
            F.col("tokens")
        ),
    ).withColumn("n_tok", F.size("tokens").cast("int"))
    n.write.mode("overwrite").parquet(new_src)
    # old table from the CHECKPOINTED encode CLI (extra lineage columns) —
    # incremental-encode must compose with it
    assert jobs.main([
        "encode", "--input", old_src, "--output", old_enc,
        "--checkpoint", str(tmp_path / "ick"), "--partitions", "16",
    ]) == 0
    capsys.readouterr()
    assert jobs.main([
        "incremental-encode", "--old-encoded", old_enc, "--old-input", old_src,
        "--input", new_src, "--output", out, "--partitions", "16",
    ]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < m["parts_changed"] <= 16 and m["blocks"] > 0
    # round-trip: the incremental table must verify against the NEW snapshot
    assert jobs.main(["verify", "--source", new_src, "--encoded", out]) == 0
    v = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert v["ok"] is True


def test_delete_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "dsrc")
    enc = str(tmp_path / "denc")
    out = str(tmp_path / "dout")
    _mk_tokens(spark, src)
    assert jobs.main([
        "encode", "--input", src, "--output", enc,
        "--checkpoint", str(tmp_path / "dck"), "--partitions", "4",
    ]) == 0
    capsys.readouterr()
    ids = [r["doc_id"] for r in spark.read.parquet(src).limit(3).collect()]
    idf = str(tmp_path / "ids.txt")
    with open(idf, "w") as f:
        f.write("\n".join(ids[1:]) + "\n")
    assert jobs.main([
        "delete", "--input", enc, "--output", out,
        "--ids", ids[0], "--ids-file", idf,
    ]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["ids_requested"] == 3 and m["docs_deleted"] == 3
    dec = jobs.main(["decode", "--input", out, "--output", str(tmp_path / "ddec")])
    assert dec == 0
    got = spark.read.parquet(str(tmp_path / "ddec"))
    assert got.filter(F.col("doc_id").isin(ids)).count() == 0
    assert got.count() == spark.read.parquet(src).count() - 3


def test_diff_docs_cli(spark, tmp_path, capsys):
    old = str(tmp_path / "dold")
    new = str(tmp_path / "dnew")
    out = str(tmp_path / "ddiff")
    _mk_tokens(spark, old)
    o = spark.read.parquet(old)
    did = F.col("doc_id").cast("long")
    o.filter(did % 11 != 0).withColumn(
        "tokens",
        F.when(did % 5 == 0, F.concat("tokens", F.array(F.lit(9)))).otherwise(
            F.col("tokens")
        ),
    ).write.mode("overwrite").parquet(new)
    assert jobs.main(["diff-docs", "--old", old, "--new", new, "--output", out]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["added"] == 0
    assert m["removed"] == o.filter(did % 11 == 0).count()
    assert m["changed"] == o.filter((did % 11 != 0) & (did % 5 == 0)).count()
    statuses = {
        r["status"] for r in spark.read.parquet(out).select("status").distinct().collect()
    }
    assert statuses == {"removed", "changed"}


def test_score_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "ssrc")
    out = str(tmp_path / "sout")
    cnts = str(tmp_path / "scnt")
    _mk_tokens(spark, src)
    assert jobs.main([
        "score", "--input", src, "--output", out, "--save-counts", cnts,
    ]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["docs"] == spark.read.parquet(src).count()
    assert m["mean_logprob"] < 0  # log2 probabilities are negative
    # second run reuses the persisted counts table and must agree exactly
    out2 = str(tmp_path / "sout2")
    assert jobs.main(["score", "--input", src, "--output", out2, "--counts", cnts]) == 0
    capsys.readouterr()
    a = spark.read.parquet(out).select("doc_id", "logprob")
    b = spark.read.parquet(out2).select("doc_id", "logprob")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pipeline_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "plsrc")
    wd = str(tmp_path / "plwd")
    out = str(tmp_path / "plenc")
    _mk_tokens(spark, src)
    argv = [
        "pipeline", "--input", src, "--workdir", wd, "--output", out,
        "--stages", "clean,dedup,sample,encode",
        "--sample-fractions", "0.9", "--partitions", "4",
    ]
    assert jobs.main(argv) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    stages = {s["stage"]: s for s in m["stages"]}
    assert list(stages) == ["clean", "dedup", "sample", "encode"]
    assert all(not s["skipped"] for s in m["stages"])
    # encoded output round-trips against the sample-stage table
    assert jobs.main([
        "verify", "--source", stages["sample"]["output"], "--encoded", out,
    ]) == 0
    v = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert v["ok"] is True
    # re-run: every stage skipped
    assert jobs.main(argv) == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert all(s["skipped"] for s in m2["stages"])


def test_shards_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "shsrc")
    packed_path = str(tmp_path / "shpacked")
    out = str(tmp_path / "shards")
    man = str(tmp_path / "shman")
    _mk_tokens(spark, src)
    assert jobs.main([
        "pack", "--input", src, "--output", packed_path, "--seq-len", "256",
    ]) == 0
    capsys.readouterr()
    assert jobs.main([
        "shards", "--input", packed_path, "--output", out,
        "--seqs-per-shard", "8", "--manifest", man,
    ]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_seqs = spark.read.parquet(packed_path).count()
    assert m["seqs"] == n_seqs and m["max_seqs_per_shard"] <= 8
    assert m["shards"] == (n_seqs + 7) // 8
    assert spark.read.parquet(man).count() == m["shards"]
