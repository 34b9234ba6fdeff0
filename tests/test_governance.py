"""Invariant tests for governance queries (watermark alignment, GDPR
erasure, bitemporal as-of)."""

from __future__ import annotations

from lets_talk_cdc_change_feed_playground_spark.operators import (
    governance_queries as G,
    temporal_queries as TQ,
)

SF = "/root/testdata/sf0.001"


def test_watermark_alignment_global_is_min(spark):
    rows = {r["partition"]: r for r in G.cdc_watermark_alignment(spark, SF).collect()}
    parts = [r for p, r in rows.items() if p >= 0]
    g = rows[-1]
    assert g["wm_ms"] == min(r["wm_ms"] for r in parts)
    assert g["delivered_n"] == sum(r["delivered_n"] for r in parts)
    assert g["held_back"] == sum(r["held_back"] for r in parts)
    assert g["wm_lead_ms"] == max(r["wm_lead_ms"] for r in parts)
    # the slowest partition defines the aligned watermark and holds nothing back
    slowest = min(parts, key=lambda r: r["wm_ms"])
    assert slowest["wm_lead_ms"] == 0
    for r in parts:
        assert r["wm_lead_ms"] >= 0
        if r["wm_lead_ms"] == 0:
            assert r["held_back"] == 0


def test_gdpr_erasure_lane_semantics(spark):
    rows = {r["method"]: r for r in G.cdc_gdpr_erasure(spark, SF).collect()}
    assert set(rows) == {"log", "polling", "trigger"}
    n_req = rows["log"]["n_requested"]
    assert n_req > 0
    # log + trigger lanes propagate every tombstone: zero residents
    for m in ("log", "trigger"):
        assert rows[m]["erasure_complete"] is True
        assert rows[m]["resident_after"] == 0
        assert rows[m]["tombstones_emitted"] >= n_req
    # polling (hard deletes invisible) keeps requested keys resident
    assert rows["polling"]["erasure_complete"] is False
    assert rows["polling"]["tombstones_emitted"] == 0
    assert 0 < rows["polling"]["resident_after"] <= n_req
    # late writes are the same audit number on every row
    assert len({r["late_writes_suppressed"] for r in rows.values()}) == 1


def test_bitemporal_grid_monotone(spark):
    rows = {(r["tt_pct"], r["vt_pct"]): r for r in TQ.cdc_bitemporal_asof(spark, SF).collect()}
    assert set(rows) == {(t, v) for t in TQ.BT_CUTS for v in TQ.BT_CUTS}
    # knowledge grows along both axes: version counts are monotone
    for t1 in TQ.BT_CUTS:
        for v1 in TQ.BT_CUTS:
            for t2 in TQ.BT_CUTS:
                for v2 in TQ.BT_CUTS:
                    if t1 <= t2 and v1 <= v2:
                        assert rows[(t1, v1)]["n_versions"] <= rows[(t2, v2)]["n_versions"]
    # the (100, 100) cell sees every key ever touched
    full = rows[(100, 100)]
    assert full["n_versions"] >= full["n_resident"] > 0


def test_anti_entropy_detects_exactly_the_injected_faults(spark):
    from lets_talk_cdc_change_feed_playground_spark.operators import capture, diffs
    from lets_talk_cdc_change_feed_playground_spark.operators.governance_queries import (
        AE_GHOST_MOD,
        AE_LOST_MOD,
        AE_STALE_MOD,
        cdc_anti_entropy,
    )

    def h(s: str) -> int:
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % 9973
        return acc

    wal = capture.log_capture(spark, SF)
    a_pks = {r["pk"] for r in diffs.replay_state(wal, ["ts_ms", "lsn"]).select("pk").collect()}
    wal_pks = {r["pk"] for r in wal.select("pk").distinct().collect()}
    lost = {p for p in a_pks if h(f"lost:{p}") % AE_LOST_MOD == 0}
    stale = {p for p in a_pks - lost if h(f"stale:{p}") % AE_STALE_MOD == 0}
    ghosts = {p for p in wal_pks - a_pks if h(f"ghost:{p}") % AE_GHOST_MOD == 0}

    rows = cdc_anti_entropy(spark, SF).collect()
    assert sum(r["missing_in_b"] for r in rows) == len(lost)
    assert sum(r["corrupt_in_b"] for r in rows) == len(
        {p for p in stale}  # corrupted keys that survive in B
    )
    assert sum(r["phantom_in_b"] for r in rows) == len(ghosts)
    for r in rows:
        assert r["repair_upserts"] == r["missing_in_b"] + r["corrupt_in_b"]
        assert r["repair_deletes"] == r["phantom_in_b"]


def test_hashchain_localizes_tamper_and_propagates(spark):
    from lets_talk_cdc_change_feed_playground_spark.operators.governance_queries import (
        cdc_wal_hashchain,
    )

    rows = sorted(cdc_wal_hashchain(spark, SF).collect(), key=lambda r: r["seg"])
    tampered = [r for r in rows if r["tampered_here"]]
    assert len(tampered) == 1  # exactly the injected record's segment
    t_seg = tampered[0]["seg"]
    for r in rows:
        assert r["segment_ok"] == (not r["tampered_here"])
        # anchors chain forward: clean before the tamper, diverged after
        assert r["anchor_ok"] == (r["seg"] < t_seg)
