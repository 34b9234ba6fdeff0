"""Round-3 streaming additions: stream-stream join + watermarked dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.operators.ops_feed import ops_feed
from lets_talk_cdc_change_feed_playground_spark.streaming import stream_queries as SQ

SF = "/root/testdata/sf0.001"


def test_dup_chunks_really_contain_cross_batch_duplicates(spark):
    path = SQ._dup_chunks(spark, SF)
    staged = spark.read.parquet(path)
    n_ops = ops_feed(spark, SF).count()
    assert staged.count() > n_ops  # duplicates were injected...
    per_seq = staged.groupBy("seq").count()
    assert per_seq.filter("count = 2").count() > 0  # ...as re-deliveries


def test_stream_dedup_restores_once_only_feed(spark):
    out = SQ.stream_dedup_watermark(spark, SF)
    ops = ops_feed(spark, SF)
    assert out.count() == ops.count()
    assert out.select("seq").distinct().count() == out.count()


def test_enrich_join_matches_every_op_exactly_once(spark):
    out = SQ.stream_enrich_join(spark, SF)
    ops = ops_feed(spark, SF)
    assert out.count() == ops.count()
    lat = out.agg(F.min("latency_ms"), F.max("latency_ms")).collect()[0]
    assert lat[0] >= SQ._ACK_BASE_MS and lat[1] < SQ._ACK_MAX_MS


def test_stream_ivm_matches_batch(spark, sf_dir):
    """The streaming delta-rule maintenance must emit exactly the batch
    IVM rows — state carried across micro-batches never drifts."""
    from lets_talk_cdc_change_feed_playground_spark.operators.ivm_queries import (
        cdc_ivm_join,
    )
    from lets_talk_cdc_change_feed_playground_spark.streaming.stream_queries import (
        stream_ivm_join,
    )

    batch = [tuple(r) for r in cdc_ivm_join(spark, sf_dir).collect()]
    stream = [tuple(r) for r in stream_ivm_join(spark, sf_dir).collect()]
    assert stream == batch
    assert all(r[-1] for r in stream)  # converged every epoch


def test_stream_scd2_equals_batch_history(spark):
    from lets_talk_cdc_change_feed_playground_spark.operators.cdc_queries import (
        cdc_scd2_history,
    )

    stream_rows = SQ.stream_scd2(spark, SF).collect()
    batch_rows = cdc_scd2_history(spark, SF).collect()
    key = lambda r: (r["pk"], r["version"])
    s = {key(r): tuple(r) for r in stream_rows}
    b = {key(r): tuple(r) for r in batch_rows}
    assert s == b  # incremental dimension == batch window fold, field-exact


def test_stream_scd2_interval_tiling(spark):
    rows = SQ.stream_scd2(spark, SF).collect()
    by_pk = {}
    for r in rows:
        by_pk.setdefault(r["pk"], []).append(r)
    for pk, rs in by_pk.items():
        rs.sort(key=lambda r: r["version"])
        open_rows = [r for r in rs if r["is_current"]]
        assert len(open_rows) <= 1  # at most one open version per key
        for a, b in zip(rs, rs[1:]):
            if a["valid_to_ms"] is not None:
                assert a["valid_to_ms"] <= b["valid_from_ms"]


def test_stream_index_matches_batch_postings(spark):
    from pyspark.sql import functions as F
    from lets_talk_cdc_change_feed_playground_spark.functions import textops as T
    from lets_talk_cdc_change_feed_playground_spark.functions.pipeline_queries import _docs_t

    idx = {r["term"]: (r["df"], r["total_tf"]) for r in SQ.stream_index_maintenance(spark, SF).collect()}
    d = _docs_t(spark, SF)
    tok = d.select("doc_id", F.explode("toks").alias("term")).filter(
        (F.length("term") >= 3) & ~F.col("term").isin(*T.STOPWORDS)
    )
    tf = tok.groupBy("doc_id", "term").count()
    batch = {
        r["term"]: (r["df"], r["total_tf"])
        for r in tf.groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("count").alias("total_tf"))
        .collect()
    }
    assert idx == batch


def test_stream_erasure_purges_requested_keys(spark):
    from lets_talk_cdc_change_feed_playground_spark.operators.governance_queries import (
        GDPR_MOD,
    )

    def h(s: str) -> int:
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % 9973
        return acc

    final = SQ.stream_erasure_propagation(spark, SF)
    resident = {r["pk"] for r in final.collect()}
    # no requested key survives in the materialized state
    assert not {p for p in resident if h(f"gdpr:{p}") % GDPR_MOD == 0}
    assert resident  # non-requested keys do survive
