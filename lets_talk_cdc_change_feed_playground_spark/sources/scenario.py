"""S1/S7/S8 — scenario fixture I/O.

The reference's scenarios are small JSON documents ``{id, name, tags, schema,
rows, ops[, events]}`` (``harness/fixtures/*.json``) normalised by
``src/features/shared-scenario-normaliser.ts:224-400``:

- op codes are case-folded and aliased (``c/create/r/read/s/snapshot`` →
  insert, ``u`` → update, ``d`` → delete);
- the pk comes from ``op.pk.id`` or is derived from ``after[<pk column>]``;
  ops without a derivable pk are dropped;
- missing ``t`` falls back to a deterministic per-index timestamp, missing
  ``table`` to the scenario's table;
- when ``ops`` is absent but Debezium-style ``events`` exist, ops are derived
  from the envelopes.

Fixture files are scenario *definitions* (bytes, not data), so they are
parsed driver-side and become DataFrames with ``MAP<STRING,STRING>`` payloads
— the open-schema representation SURVEY §1.3 calls for.  The op feed a
scenario produces is tiny; the 100 TB path replays it against big tables, it
is never itself big.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

OPS_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("t", LongType()),
        StructField("table", StringType()),
        StructField("pk", StringType()),
        StructField("op", StringType()),
        StructField("after", MapType(StringType(), StringType())),
        StructField("tx_id", StringType()),
        StructField("tx_index", IntegerType()),
        StructField("tx_total", IntegerType()),
    ]
)

ROWS_SCHEMA = StructType(
    [
        StructField("table", StringType()),
        StructField("pk", StringType()),
        StructField("data", MapType(StringType(), StringType())),
    ]
)

_OP_ALIASES = {
    "c": "insert",
    "create": "insert",
    "r": "insert",
    "read": "insert",
    "s": "insert",
    "snapshot": "insert",
    "insert": "insert",
    "u": "update",
    "update": "update",
    "d": "delete",
    "delete": "delete",
}


@dataclass
class Scenario:
    id: str
    name: str
    tags: list[str]
    schema: list[dict]
    seed: int | None = None
    description: str = ""
    _rows: list[dict] = field(default_factory=list)
    _ops: list[dict] = field(default_factory=list)

    def rows_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self._rows, ROWS_SCHEMA)

    def ops_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self._ops, OPS_SCHEMA)


def _scalar(v: Any) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # JSON round-trip canonical form: integral floats print bare
        if math.isfinite(v) and v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (dict, list)):
        return json.dumps(v, sort_keys=True, separators=(",", ":"))
    return str(v)


def _as_map(obj: Any) -> dict[str, str]:
    if not isinstance(obj, dict):
        return {}
    return {str(k): _scalar(v) for k, v in obj.items()}


def _normalise_op(raw: Any) -> str | None:
    if not isinstance(raw, str):
        return None
    return _OP_ALIASES.get(raw.strip().lower())


def _pk_column(schema: list[dict]) -> str | None:
    for col in schema:
        if col.get("pk"):
            return col.get("name")
    return None


def _derive_pk(op: dict, schema: list[dict]) -> str | None:
    pk = op.get("pk")
    if isinstance(pk, dict) and pk.get("id") is not None:
        return _scalar(pk["id"])
    if pk is not None and not isinstance(pk, dict):
        return _scalar(pk)  # Debezium-style scalar key
    pk_col = _pk_column(schema)
    after = op.get("after")
    if pk_col and isinstance(after, dict) and after.get(pk_col) is not None:
        return _scalar(after[pk_col])
    return None


def _ops_from_events(events: list[Any]) -> list[dict]:
    """Debezium envelopes → ops (``shared-scenario-normaliser.ts:262-359``):
    c/r/s become inserts, u updates, d deletes; payload.after is the image."""
    out = []
    for ev in events:
        if not isinstance(ev, dict):
            continue
        payload = ev.get("payload", ev)
        code = _normalise_op(payload.get("op"))
        if code is None:
            continue
        out.append(
            {
                "t": payload.get("ts_ms"),
                "op": code,
                "table": (payload.get("source") or {}).get("table") or ev.get("table"),
                "pk": ev.get("key") if ev.get("key") is not None else payload.get("key"),
                "after": payload.get("after"),
            }
        )
    return out


def load_scenario(path: str) -> Scenario:
    """S1 — parse + normalise one scenario fixture."""
    with open(path) as f:
        doc = json.load(f)
    schema = [c for c in doc.get("schema", []) if isinstance(c, dict)]
    fallback_table = doc.get("table") or doc.get("id") or "data"

    raw_ops = doc.get("ops")
    if not raw_ops and doc.get("events"):
        raw_ops = _ops_from_events(doc["events"])

    ops: list[dict] = []
    for idx, op in enumerate(raw_ops or []):
        if not isinstance(op, dict):
            continue
        code = _normalise_op(op.get("op"))
        if code is None:
            continue
        pk = _derive_pk(op, schema)
        if pk is None:
            continue  # normaliser drops ops without a derivable pk
        t = op.get("t")
        if not isinstance(t, (int, float)) or not math.isfinite(t):
            t = (idx + 1) * 10  # deterministic fallback timestamp
        txn = op.get("txn") or {}
        ops.append(
            {
                "seq": idx,
                "t": int(t),
                "table": op.get("table") or fallback_table,
                "pk": pk,
                "op": code,
                "after": _as_map(op.get("after")) if code != "delete" else None,
                "tx_id": _scalar(txn.get("id")) if txn else None,
                "tx_index": int(txn["index"]) if txn.get("index") is not None else None,
                "tx_total": int(txn["total"]) if txn.get("total") is not None else None,
            }
        )

    pk_col = _pk_column(schema) or "id"
    rows = []
    for r in doc.get("rows", []):
        if isinstance(r, dict) and r.get(pk_col) is not None:
            rows.append(
                {
                    "table": fallback_table,
                    "pk": _scalar(r[pk_col]),
                    "data": _as_map(r),
                }
            )

    return Scenario(
        id=doc.get("id", os.path.basename(path)),
        name=doc.get("name", ""),
        tags=list(doc.get("tags", [])),
        schema=schema,
        seed=doc.get("seed"),
        description=doc.get("description", ""),
        _rows=rows,
        _ops=ops,
    )


def snapshot_ops(scenario: Scenario, spark: SparkSession, t: int = 0) -> DataFrame:
    """S3 — seed rows as snapshot INSERT events preceding the stream
    (``src/modes/logBased.ts:147-187``): ``tx_id = snapshot-<pk>``."""
    rows = scenario.rows_df(spark)
    return rows.select(
        F.lit(-1).cast("long").alias("seq"),
        F.lit(t).cast("long").alias("t"),
        "table",
        "pk",
        F.lit("insert").alias("op"),
        F.col("data").alias("after"),
        F.concat(F.lit("snapshot-"), F.col("pk")).alias("tx_id"),
        F.lit(0).alias("tx_index"),
        F.lit(1).alias("tx_total"),
    )


def export_events_ndjson(events: DataFrame, path: str) -> None:
    """S7 — NDJSON event export (``src/ui/eventLogExport.ts:112-182``): one
    flat JSON record per line, ``tx.*`` flattened to ``txn_*``."""
    flat = events
    for c in list(events.columns):
        if c == "tx" and dict(events.dtypes)[c].startswith("struct"):
            for sub in events.select("tx.*").columns:
                flat = flat.withColumn(f"txn_{sub}", F.col(f"tx.{sub}"))
            flat = flat.drop("tx")
    flat.write.mode("overwrite").json(path)


def scenario_to_json(scenario: Scenario) -> dict:
    """S8 — scenario → export document (round-trips through load_scenario)."""
    return {
        "id": scenario.id,
        "name": scenario.name,
        "description": scenario.description,
        "tags": scenario.tags,
        "seed": scenario.seed,
        "schema": scenario.schema,
        "rows": [dict(r["data"]) for r in scenario._rows],
        "ops": [
            {
                "t": o["t"],
                "op": o["op"],
                "table": o["table"],
                "pk": {"id": o["pk"]},
                **({"after": o["after"]} if o["after"] is not None else {}),
                **(
                    {
                        "txn": {
                            "id": o["tx_id"],
                            "index": o["tx_index"],
                            "total": o["tx_total"],
                        }
                    }
                    if o["tx_id"]
                    else {}
                ),
            }
            for o in scenario._ops
        ],
    }


def save_scenario(scenario: Scenario, path: str) -> None:
    with open(path, "w") as f:
        json.dump(scenario_to_json(scenario), f, indent=2)


def ops_to_sql(ops: DataFrame, pk_col: str = "id") -> DataFrame:
    """S5 — SQL workload driver equivalent: render each op as the INSERT /
    UPDATE / DELETE statement the reference's workload driver would issue
    against the source database (``scenarios/01-canonical-reference/source/
    generator.mjs`` emits exactly these three shapes). Output is one row per
    op ``(seq, t, table, stmt)`` in replay order — pipe it to any JDBC
    source to drive a real database with the scenario.

    All string building is JVM-side column logic (no UDF); values are
    single-quote-escaped. Upserts render as ``INSERT ... ON CONFLICT DO
    UPDATE`` only when the caller asks the reference's Postgres dialect —
    here the plain three-verb form keeps parity with the driver script.
    """
    esc = lambda c: F.regexp_replace(c, "'", "''")  # noqa: E731
    # null map values render as SQL NULL (quoted-concat of a null would
    # otherwise drop the element from one list but not the other)
    lit = lambda e: F.coalesce(  # noqa: E731
        F.concat(F.lit("'"), esc(e["value"]), F.lit("'")), F.lit("NULL")
    )
    kv = F.sort_array(F.map_entries(F.col("after")))  # key-ordered, deterministic
    cols = F.array_join(F.transform(kv, lambda e: e["key"]), ", ")
    vals = F.array_join(F.transform(kv, lit), ", ")
    sets = F.array_join(
        F.transform(kv, lambda e: F.concat(e["key"], F.lit(" = "), lit(e))),
        ", ",
    )
    where = F.concat(F.lit(pk_col + " = '"), esc(F.col("pk")), F.lit("'"))
    # an op without payload fields still renders executable SQL: the pk
    # column carries the insert, and the update degrades to a pk self-set
    empty = F.size(kv) == 0
    pk_lit = F.concat(F.lit("'"), esc(F.col("pk")), F.lit("'"))
    stmt = (
        F.when(
            (F.col("op") == "insert") & empty,
            F.concat(
                F.lit("INSERT INTO "), F.col("table"),
                F.lit(f" ({pk_col}) VALUES ("), pk_lit, F.lit(");"),
            ),
        )
        .when(
            F.col("op") == "insert",
            F.concat(
                F.lit("INSERT INTO "), F.col("table"), F.lit(" ("), cols,
                F.lit(") VALUES ("), vals, F.lit(");"),
            ),
        )
        .when(
            (F.col("op") == "update") & empty,
            F.concat(
                F.lit("UPDATE "), F.col("table"),
                F.lit(f" SET {pk_col} = "), pk_lit,
                F.lit(" WHERE "), where, F.lit(";"),
            ),
        )
        .when(
            F.col("op") == "update",
            F.concat(
                F.lit("UPDATE "), F.col("table"), F.lit(" SET "), sets,
                F.lit(" WHERE "), where, F.lit(";"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("DELETE FROM "), F.col("table"), F.lit(" WHERE "), where,
                F.lit(";"),
            )
        )
    )
    return ops.select("seq", "t", "table", stmt.alias("stmt")).orderBy("t", "seq")
