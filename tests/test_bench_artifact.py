"""The driver records only a bounded tail of bench stdout; the final JSON
line must always fit it (BENCH_r04 became unparseable when stage_metrics
rode the final line).  compact_final_line is the guard."""

from __future__ import annotations

import json

import bench


def _representative_out() -> dict:
    # every query/extra key the r4 suite emitted, plus round-5 additions,
    # with worst-case-width values — the guard must hold as rows accrue
    queries = {
        k: 123.456
        for k in [
            "q1_encode_auto", "q1b_encode_bucketed", "q2_decode", "q3_estimate",
            "q4_encode_documents", "q4b_compact_blocks", "q5_encode_timeseries",
            "q5b_encode_5m_points", "q5c_decode_5m_points", "q5d_encode_5m_nosink",
            "q5e_encode_5m_presorted", "q6_encode_for", "q6_encode_forc",
            "q6_encode_rle", "q6_encode_dict", "q6_encode_delta", "q6_encode_dod",
            "q6_encode_fsst", "q7_dedup_exact", "q8_neardup_minhash",
            "q8b_simhash_kernel", "q8c_simhash_hof_10k", "q8d_decontaminate",
            "q9_encode_vectors", "q9b_encode_vectors_int8", "q10_topk_bruteforce",
            "q10b_pq_train_encode_search", "q11_ann_pruned", "q12_wire_encode_5m",
            "q12b_wire_decode_5m", "q12c_wire_decode_foreign", "q13_pack_sequences",
            "q14_stream_neardup",
        ]
    }
    extras = {
        "calib_sec": 2.345,
        "codec_mix": {"for": 1000, "rle": 2000, "dict": 3000, "fsst": 400, "dod": 50},
        "compression_ratio": 0.2765, "encode_tokens_per_sec": 23456789,
        "encode_bucketed_tokens_per_sec": 34567890, "decode_tokens_per_sec": 45678901,
        "documents_ratio": 0.5432, "compact_tokens_per_sec": 12345678,
        "compact_blocks_before": 1234, "compact_blocks_after": 56,
        "timeseries_ratio": 0.0877, "timeseries_points_per_sec": 1234567,
        "ts5m_encode_points_per_sec": 2501234, "ts5m_ratio": 0.0877,
        "ts5m_decode_points_per_sec": 12646130,
        "ts5m_encode_nosink_points_per_sec": 3068555,
        "ts5m_encode_presorted_points_per_sec": 3941234,
        "corpus_docs": 92396, "dedup_docs_per_sec": 98232, "dedup_removed": 2029,
        "neardup_docs_per_sec": 8588, "neardup_pairs": 3468,
        "simhash_kernel_docs_per_sec": 61798, "simhash_speedup_vs_hof": 98.214,
        "decontaminate_docs_per_sec": 12995, "decontaminate_pairs": 25,
        "vector_values_per_sec": 17712345, "vector_ratio": 0.8123,
        "vector_ratio_int8": 0.297, "pq_vecs_per_sec": 317123,
        "ann_blocks_frac": 0.087, "ivfpq_probe_frac": 0.0712,
        "ivfpq_recall_at_50": 0.9123, "pack_tokens_per_sec": 34412345,
        "pack_seqs": 123456, "stream_neardup_docs_per_sec": 1400,
        "stream_neardup_pairs": 123, "wire_encode_points_per_sec": 2401234,
        "wire_ratio": 0.523, "wire_decode_points_per_sec": 6121234,
        "wire_decode_foreign_points_per_sec": 1523456,
        "bench_passes": 2, "pass_total_sec": [123.456, 120.123],
        "total_tokens": 1024123456,
        "stage_metrics": [{"stage": i, "shuffle_read": 10**9} for i in range(40)],
    }
    return {
        "metric": "total_bench_sec", "value": 1234.567, "unit": "sec",
        "queries": queries, "sf": 0.1, **extras,
    }


def test_final_line_fits_driver_tail():
    line = bench.compact_final_line(_representative_out())
    assert len(line) <= bench._FINAL_LINE_LIMIT
    parsed = json.loads(line)
    # headline rows must survive the trim
    assert parsed["metric"] == "total_bench_sec"
    for key in (
        "calib_sec", "compression_ratio", "encode_tokens_per_sec",
        "decode_tokens_per_sec", "ts5m_encode_points_per_sec",
        "ts5m_decode_points_per_sec", "wire_encode_points_per_sec",
        "wire_decode_points_per_sec", "ivfpq_probe_frac", "ivfpq_recall_at_50",
        "neardup_docs_per_sec", "pack_tokens_per_sec",
    ):
        assert key in parsed, key
    assert "stage_metrics" not in parsed
    assert "q1_encode_auto" in parsed["queries"]


def test_small_out_unchanged():
    out = {"metric": "total_bench_sec", "value": 1.0, "unit": "sec",
           "queries": {"q1": 0.5}, "sf": 0.01, "codec_mix": {"rle": 3}}
    assert json.loads(bench.compact_final_line(out)) == out
