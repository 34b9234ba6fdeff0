"""S6 Kafka source builder.

The plan-construction half runs broker-free (the builder must produce a
streaming Kafka scan with the right subscription, cast and parse stages —
verified against the analyzed plan); the end-to-end half needs a real
broker + the spark-sql-kafka package and is skip-marked on their absence
(``SPARK_GRAFT_KAFKA_BOOTSTRAP`` opts in).
"""

from __future__ import annotations

import os

import pytest

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")


def _kafka_pkg_available(spark) -> bool:
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "none:9092"
        ).option("subscribe", "t").load()
        return True
    except Exception as e:
        return "KAFKA_DATA_SOURCE" not in str(e) and "Failed to find" not in str(e)


def test_kafka_source_builds_expected_plan(spark):
    """Broker-free: the builder must wire subscribePattern on the prefix,
    the delivery cap, and the envelope parse — all visible in the plan."""
    from lets_talk_cdc_change_feed_playground_spark.sources.debezium import kafka_source

    if not _kafka_pkg_available(spark):
        pytest.skip("spark-sql-kafka package not on the classpath")
    df = kafka_source(
        spark, "broker:9092", max_offsets_per_trigger=500, passthrough_offsets=True
    )
    assert df.isStreaming
    cols = set(df.columns)
    assert {"tbl", "pk", "op", "before", "after", "ts_ms", "partition", "offset"} <= cols
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "from_json" in plan or "jsontostructs" in plan.lower()


@pytest.mark.skipif(
    not BOOTSTRAP, reason="no broker: set SPARK_GRAFT_KAFKA_BOOTSTRAP to run"
)
def test_kafka_roundtrip_via_broker(spark, tmp_path):
    """End-to-end with a real broker: emit_debezium → Kafka → kafka_source
    must round-trip the change events exactly."""
    from pyspark.sql import functions as F

    from lets_talk_cdc_change_feed_playground_spark.sources.debezium import (
        emit_debezium,
        kafka_source,
        to_kafka_writer,
    )

    rows = spark.createDataFrame(
        [("p1", "c", None, {"v": "1"}, 100), ("p1", "u", {"v": "1"}, {"v": "2"}, 200)],
        "pk string, op string, before map<string,string>, after map<string,string>, ts_ms long",
    )
    to_kafka_writer(emit_debezium(rows, "orders"), BOOTSTRAP).save()

    got = kafka_source(spark, BOOTSTRAP, streaming=False)
    out = {
        (r["pk"], r["op"], r["ts_ms"]): (r["before"], r["after"])
        for r in got.filter(F.col("tbl") == "orders").collect()
    }
    assert ("p1", "u", 200) in out
    assert dict(out[("p1", "u", 200)][1]) == {"v": "2"}


def test_wire_fixture_through_streaming_parse_path(spark, tmp_path):
    """Consumer contract, broker-free (round-7 task): the committed wire
    fixture replays through the PARSING STAGE of ``kafka_source`` as a real
    micro-batched stream — a file-source stand-in delivers the same
    ``(topic, key, value)`` record triples the Kafka scan emits, one record
    file per trigger, through ``parse_debezium_wire`` (the exact function
    ``kafka_source`` wires in).  The unioned per-batch output must equal the
    batch parse of the same fixture, proving the parse stage is stateless
    row-local logic that behaves identically under streaming execution —
    the strongest S6 claim this sandbox can check without a broker."""
    import json

    from pyspark.sql import functions as F

    from lets_talk_cdc_change_feed_playground_spark.sources.debezium import (
        parse_debezium_wire,
    )

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "debezium_wire.ndjson")
    records = [json.loads(line) for line in open(fixture) if line.strip()]
    rows = [(r["topic"], r.get("key"), r.get("value")) for r in records]
    schema = "topic string, key string, value string"

    # one record per chunk file, mtime-pinned so delivery order is the
    # fixture order — each record becomes its own micro-batch
    src_dir = tmp_path / "wire_chunks"
    src_dir.mkdir()
    base = 1_700_000_000
    for i, row in enumerate(rows):
        cdir = tmp_path / f"c{i}"
        spark.createDataFrame([row], schema).coalesce(1).write.parquet(str(cdir))
        part = next(p for p in os.listdir(cdir) if p.endswith(".parquet"))
        dst = src_dir / f"{i:02d}.parquet"
        os.rename(cdir / part, dst)
        os.utime(dst, (base + i, base + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    parsed = parse_debezium_wire(stream)
    assert parsed.isStreaming  # the parse stage composes onto a real stream

    batches: list[tuple[int, int]] = []
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def sink(bdf, bid):
        batches.append((bid, bdf.count()))
        bdf.write.mode("append").parquet(out_dir)

    q = (
        parsed.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(batches) >= len(rows)  # genuinely micro-batched, not one gulp

    got = spark.read.parquet(out_dir)
    want = parse_debezium_wire(spark.createDataFrame(rows, schema))
    cols = ["tbl", "pk", "op", "before", "after", "ts_ms", "lsn"]
    as_rows = lambda df: sorted(  # noqa: E731
        tuple(
            sorted(v.items()) if isinstance(v, dict) else v for v in (r[c] for c in cols)
        )
        for r in df.collect()
    )
    assert as_rows(got) == as_rows(want)
    assert want.count() > 0  # the fixture's keepable c/u/d events survived
