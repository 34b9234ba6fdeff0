"""Wire-fixture replay for the Debezium source (S6, broker-free e2e).

No Kafka broker exists in this sandbox, so the closest approximation to the
reference's live verifier run (``harness/verifier/index.js:248-285``) is a
COMMITTED capture of real connector envelope shapes —
``tests/fixtures/debezium_wire.ndjson`` holds Debezium PostgreSQL 2.x JSON
records covering the schema+payload wrapper, the flattened
``schemas.enable=false`` variant, key-envelope pk fallback, snapshot reads,
tombstones, sequence-only LSNs, and mixed-case source tables — replayed
through ``parse_debezium_wire`` → replay fold → verdict against the
hand-derived expected state.
"""

from __future__ import annotations

import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.sources.debezium import (
    parse_debezium_wire,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "debezium_wire.ndjson")


def _records(spark):
    return spark.read.schema("topic string, key string, value string").json(FIXTURE)


def test_wire_parse_extraction_rules(spark):
    got = {
        (r["tbl"], r["pk"], r["op"]): r
        for r in parse_debezium_wire(_records(spark)).collect()
    }
    # 9 fixture lines -> 7 change events ('r' snapshot + tombstone dropped)
    assert len(got) == 7
    # schema+payload wrapper, pk from after.id, integer lsn as string
    c1 = got[("customers", "1", "c")]
    assert c1["after"]["name"] == "alice"
    assert c1["after"]["balance"] == "12.50"
    assert c1["lsn"] == "24023001"
    assert c1["ts_ms"] == 1700000001000
    # delete: after is null, pk falls back to before.id
    d2 = got[("customers", "2", "d")]
    assert d2["after"] is None and d2["before"]["name"] == "bob"
    # flat envelope (schemas.enable=false): same extraction, sequence-only lsn
    o1 = got[("orders", "501", "c")]
    assert o1["lsn"] == '["24023119","24023256"]'
    # nested object row values survive as JSON text (sanitizeRow analogue)
    assert o1["after"]["items"] == '{"sku":"A1","qty":2}'
    # pk only in the key envelope; source.table 'Ledger' lowercased
    l1 = got[("ledger", "9000", "c")]
    assert l1["after"]["account"] == "acc-77"


def test_wire_replay_fold_verdict(spark):
    """parse → last-writer-wins fold per (tbl, pk) — the A1/A2 apply path —
    must land on the hand-derived final state of the captured session."""
    ev = parse_debezium_wire(_records(spark))
    w = W.partitionBy("tbl", "pk").orderBy(F.desc("ts_ms"), F.desc("lsn"))
    final = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "d"))
        .select("tbl", "pk", "after")
    )
    rows = {(r["tbl"], r["pk"]): r["after"] for r in final.collect()}
    # customer 1 updated; customer 2 deleted; snapshot-read 3 never entered;
    # order 501 updated; ledger 9000 created
    assert set(rows) == {("customers", "1"), ("orders", "501"), ("ledger", "9000")}
    assert rows[("customers", "1")]["balance"] == "99.00"
    assert rows[("orders", "501")]["total"] == "55.5"
    assert rows[("orders", "501")]["items"] == '{"sku":"A1","qty":3}'


def test_wire_matches_internal_emit_roundtrip(spark):
    """The internal emit→parse pair stays consistent with the wire parser:
    an emit_debezium record parses to the same event under both parsers."""
    from lets_talk_cdc_change_feed_playground_spark.sources.debezium import (
        emit_debezium,
        parse_debezium,
    )

    src = spark.createDataFrame(
        [("7", "c", 1700000000000)], "pk string, op string, ts_ms long"
    ).select(
        "pk",
        "op",
        "ts_ms",
        F.lit(None).cast("map<string,string>").alias("before"),
        F.create_map(F.lit("id"), F.col("pk"), F.lit("v"), F.lit("x")).alias("after"),
    )
    rec = emit_debezium(src, "events")
    a = parse_debezium(rec).select("tbl", "pk", "op", "after", "ts_ms").collect()
    b = parse_debezium_wire(rec).select("tbl", "pk", "op", "after", "ts_ms").collect()
    assert a == b
