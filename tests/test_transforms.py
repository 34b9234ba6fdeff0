"""Invariant tests for the SMT chain, 2PC epoch sink, substring dedup, IVFADC."""

from __future__ import annotations

from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.functions.pipeline_queries import (
    SPAN_TOKENS,
    TOPK,
    TOPK_QUERIES,
    docs_substring_dedup,
    emb_topk_similarity,
)
from lets_talk_cdc_change_feed_playground_spark.functions.training_queries import (
    emb_ivfpq_topk,
)
from lets_talk_cdc_change_feed_playground_spark.operators.capture import log_capture
from lets_talk_cdc_change_feed_playground_spark.operators.transform_queries import (
    EPOCH_N,
    cdc_epoch_2pc,
    cdc_smt_chain,
)

SF = "/root/testdata/sf0.001"


def test_smt_chain_routing_and_masking(spark):
    rows = cdc_smt_chain(spark, SF).collect()
    wal_n = log_capture(spark, SF).count()
    assert len(rows) == wal_n  # stateless chain: one record in, one out
    for r in rows[:200]:
        assert r["topic"] == "warehouse.log_events"
        assert r["__source_topic"] == "cdc.log.events"
        assert r["__deleted"] == ("true" if r["op"] == "d" else "false")
        if r["props"] is not None:
            assert set(r["props"]) == {"*"}  # masked, same length
        assert r["ts_iso"].startswith("202")  # ISO rendering happened


def test_epoch_2pc_exactly_once(spark):
    rows = cdc_epoch_2pc(spark, SF).collect()
    wal_n = log_capture(spark, SF).count()
    # dense epochs, exactly-once totals
    assert [r["epoch"] for r in rows] == list(range(len(rows)))
    assert sum(r["applied_rows"] for r in rows) == wal_n
    assert all(r["commits"] == 1 for r in rows)
    crash = [r for r in rows if r["prepares"] == 2]
    assert len(crash) == 1  # exactly one crash epoch, replayed once
    assert crash[0]["discarded_rows"] == crash[0]["n_events"]
    for r in rows:
        assert r["last_lsn"] - r["first_lsn"] + 1 == r["n_events"] <= EPOCH_N


def test_substring_spans_are_maximal_and_bounded(spark):
    rows = docs_substring_dedup(spark, SF).collect()
    assert rows, "corpus has no cross-doc duplicated runs?"
    for r in rows:
        # every span covers >= one full window; spans never exceed the doc
        assert r["n_spans"] >= 1
        assert r["dup_tokens"] >= SPAN_TOKENS
        assert r["dup_tokens"] <= r["n_tokens"]
        assert 0 < r["dup_frac_bp"] <= 10000
        # maximality: merged spans must average >= one window width
        assert r["dup_tokens"] >= r["n_spans"] * SPAN_TOKENS


def test_ivfpq_recall_vs_exact(spark):
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in emb_topk_similarity(spark, SF).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in emb_ivfpq_topk(spark, SF).collect()
    }
    assert len(approx) == TOPK_QUERIES * TOPK
    # IVF probing + 8-entry residual codebooks: coarse, but far above the
    # random-candidate floor. Measured at sf0.001: ~0.3 recall@10 against
    # the exact-cosine baseline (ADC ranks by L2, baseline by cosine).
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.15, f"IVFADC recall collapsed: {recall}"
