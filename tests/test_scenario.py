"""Scenario fixture I/O (S1/S3/S7/S8) and schema evolution (C4/A9/A10/V6)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.operators import schema_evolution as SE
from lets_talk_cdc_change_feed_playground_spark.sources import scenario as SC

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def crud(spark):
    return SC.load_scenario(os.path.join(FIXTURES, "crud_demo.json"))


def test_scenario_normalisation(spark, crud):
    ops = crud.ops_df(spark).orderBy("seq").collect()
    # 'bogus' op and the pk-less update are dropped; 'UPDATE'/'c' normalised
    assert [o["op"] for o in ops] == [
        "insert", "update", "insert", "update", "delete", "insert", "delete",
    ]
    # pk derived from after[id] for the 'c' op without explicit pk
    assert ops[2]["pk"] == "u3"
    # missing t falls back deterministically; booleans/floats canonicalised
    assert ops[4]["t"] == 50
    last_insert = ops[5]
    assert last_insert["after"]["active"] == "true"
    assert last_insert["after"]["score"] == "91.5"
    assert last_insert["tx_id"] == "TX-1" and last_insert["tx_total"] == 2


def test_ops_derived_from_debezium_events(spark):
    sc = SC.load_scenario(os.path.join(FIXTURES, "events_only.json"))
    ops = sc.ops_df(spark).orderBy("seq").collect()
    assert [o["op"] for o in ops] == ["insert", "update", "delete", "insert"]
    assert all(o["table"] == "widgets" for o in ops)
    assert ops[2]["after"] is None


def test_snapshot_ops(spark, crud):
    snap = SC.snapshot_ops(crud, spark).collect()
    assert len(snap) == 1
    assert snap[0]["tx_id"] == "snapshot-u1"
    assert snap[0]["after"]["name"] == "Ada"


def test_scenario_round_trip(spark, crud, tmp_path):
    path = str(tmp_path / "exported.json")
    SC.save_scenario(crud, path)
    again = SC.load_scenario(path)
    assert SC.scenario_to_json(again) == SC.scenario_to_json(crud)


def test_ndjson_export(spark, crud, tmp_path):
    ops = crud.ops_df(spark).withColumn(
        "tx", F.struct(F.col("tx_id").alias("id"), F.col("tx_index").alias("index"))
    ).drop("tx_id", "tx_index")
    out = str(tmp_path / "events_ndjson")
    SC.export_events_ndjson(ops, out)
    lines = []
    for f in os.listdir(out):
        if f.endswith(".json"):
            with open(os.path.join(out, f)) as fh:
                lines += [json.loads(l) for l in fh if l.strip()]
    assert len(lines) == 7
    assert any("txn_id" in l for l in lines)
    assert all("tx" not in l for l in lines)


def test_schema_versions_and_change_events(spark, crud):
    ops = crud.ops_df(spark)
    ver = SE.schema_versions(ops)
    # columns introduced: op0 (name,email) v2; op3 adds tier v3; op7 adds
    # id/active/score... op2 adds id → v3 at seq2? walk: seq0 name,email=2;
    # seq2 adds id => 3; seq3 adds tier => 4; seq7 adds active,score => 6
    got = {r["seq"]: r["schema_version"] for r in ver.collect()}
    assert got[0] == 2 and got[1] == 2 and got[2] == 3 and got[3] == 4
    assert got[7] == 6
    ev = SE.schema_change_events(ops).orderBy("t", "seq", "column").collect()
    assert [e["op"] for e in ev] == ["s"] * len(ev)
    cols = [e["column"] for e in ev]
    assert cols[0:2] == ["email", "name"] or set(cols[0:2]) == {"name", "email"}
    types = {e["column"]: e["col_type"] for e in ev}
    assert types["score"] == "number" and types["active"] == "bool"
    assert types["name"] == "string"


def test_replay_fold_partial_updates(spark, crud):
    ops = crud.ops_df(spark)
    state = {r["pk"]: r["data"] for r in SE.replay_fold(ops).collect()}
    # u2: insert + partial updates then deleted in TX-1 → gone
    assert "u2" not in state
    # u3: its delete carries no t and falls back to t=50, which sorts BEFORE
    # the t=250 insert — so u3 survives (fold honors logical time, not file
    # order)
    assert state["u3"]["name"] == "Edsger"
    # u4 survives with all fields
    assert state["u4"]["name"] == "Barbara" and state["u4"]["active"] == "true"


def test_replay_fold_single_exchange(spark, crud):
    """The fold is one pass: a single hash exchange on (table, pk) feeds the
    window and both aggregations — the earlier shape re-executed the payload
    construction three times (key-stats aggregate, exploded updates, final
    join)."""
    plan = SE.replay_fold(crud.ops_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_replay_fold_merges_partials(spark, crud):
    # drop the final delete of u2 to check the merge: name from insert,
    # email from update 2, tier from update 3
    ops = crud.ops_df(spark).filter(~((F.col("op") == "delete") & (F.col("pk") == "u2")))
    state = {r["pk"]: r["data"] for r in SE.replay_fold(ops).collect()}
    assert state["u2"] == {
        "name": "Grace",
        "email": "grace@hopper.dev",
        "tier": "gold",
    }


def test_projection_toggle(spark, crud):
    ops = crud.ops_df(spark).filter(~((F.col("op") == "delete") & (F.col("pk") == "u2")))
    state = {r["pk"]: r["data"] for r in SE.replay_fold(ops, drop_columns=("tier",)).collect()}
    assert "tier" not in state["u2"]


def test_canonical_value_coercion(spark):
    df = spark.createDataFrame(
        [("1.50", "1.5"), ("007", "7"), ("  x ", "x"), ("1e3", "1e3")],
        ["a", "b"],
    )
    got = df.select(
        (SE.canon_value(F.col("a")) == SE.canon_value(F.col("b"))).alias("eq")
    ).collect()
    assert [r["eq"] for r in got] == [True, True, True, True]


def test_states_equal_coercive(spark):
    df = spark.createDataFrame(
        [
            ({"x": "1.0", "y": "a"}, {"x": "1", "y": "a"}, True),
            ({"x": "1"}, {"x": "2"}, False),
            ({"x": "1"}, {"x": "1", "z": "2"}, False),
        ],
        ["a", "b", "want"],
    )
    got = df.select(SE.states_equal_coercive(F.col("a"), F.col("b")).alias("eq"), "want").collect()
    assert all(r["eq"] == r["want"] for r in got)


def test_ops_to_sql_statements(spark, crud):
    stmts = {r["seq"]: r["stmt"] for r in SC.ops_to_sql(crud.ops_df(spark)).collect()}
    ins = stmts[0]
    assert ins.startswith("INSERT INTO users (") and ins.endswith(");")
    assert "'Grace'" in ins
    upd = stmts[3]
    assert upd.startswith("UPDATE users SET ") and "WHERE id = 'u2';" in upd
    assert "tier = 'gold'" in upd
    dels = [s for s in stmts.values() if s.startswith("DELETE FROM ")]
    assert any("WHERE id = 'u2';" in s for s in dels)
    # quote escaping survives round-trip
    df = spark.createDataFrame(
        [(0, 1, "t1", "k'1", "insert", {"name": "O'Hara"}, None, None, None)],
        SC.OPS_SCHEMA,
    )
    s = SC.ops_to_sql(df).first()["stmt"]
    assert "O''Hara" in s


def test_ops_to_sql_null_values(spark):
    df = spark.createDataFrame(
        [
            (0, 1, "t1", "k1", "insert", {"id": "k1", "nick": None}, None, None, None),
            (1, 2, "t1", "k1", "update", {"nick": None}, None, None, None),
        ],
        SC.OPS_SCHEMA,
    )
    stmts = [r["stmt"] for r in SC.ops_to_sql(df).collect()]
    assert stmts[0] == "INSERT INTO t1 (id, nick) VALUES ('k1', NULL);"
    assert stmts[1] == "UPDATE t1 SET nick = NULL WHERE id = 'k1';"


def test_ops_to_sql_empty_payload(spark):
    df = spark.createDataFrame(
        [
            (0, 1, "t1", "k1", "insert", {}, None, None, None),
            (1, 2, "t1", "k1", "update", {}, None, None, None),
        ],
        SC.OPS_SCHEMA,
    )
    stmts = [r["stmt"] for r in SC.ops_to_sql(df).collect()]
    assert stmts[0] == "INSERT INTO t1 (id) VALUES ('k1');"
    assert stmts[1] == "UPDATE t1 SET id = 'k1' WHERE id = 'k1';"
