"""Tick-phase boundary fuzz for the three capture engines (round-7 task).

C2's lossy semantics hinge on poll windows ``(k·poll_ms, (k+1)·poll_ms]``
aligning with the reference's ``lastSync`` phase
(``sim/engines/PollingEngine.ts:55-62``); C1/C3 emit at the tick following
the op (``(t div tick + 1) * tick``).  The seeded suite covers the default
intervals only — here the intervals are fuzzed over odd values (1 ms,
primes, composite, larger-than-horizon) with workloads that deliberately
place ops exactly ON window boundaries and ±1 ms around them, and every
engine is checked row-for-row against the DuckDB twin parameterized with
the SAME interval (``cdc_queries.wal_sql/poll_state_sql/audit_sql``).

A divergence here means the Spark window arithmetic and the SQL twin
disagree about which tick an edge-timestamp op belongs to — exactly the
class of bug the default-interval oracles can never see (the testdata feed
has no op on an exact hour boundary).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lets_talk_cdc_change_feed_playground_spark.operators import capture
from lets_talk_cdc_change_feed_playground_spark.operators.cdc_queries import (
    audit_sql,
    poll_state_sql,
    wal_sql,
)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from lets_talk_cdc_change_feed_playground_spark import get_spark

        _spark = get_spark("tickfuzz", master="local[4]", shuffle_partitions=4)
    return _spark


# odd tick intervals: 1 ms (every op its own window), small/large primes,
# a composite, and one far beyond the workload horizon (single window)
TICKS = [1, 7, 977, 65_537, 86_400_000, 10**13]

# a workload op = (key selector, op selector, window slot, phase offset);
# phase offsets hit the exact boundary (0), both neighbours (±1) and
# interior points — t is derived from the interval under test so the
# boundary cases stay boundary cases for every fuzzed tick
workloads = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 5),
        st.integers(0, 6),
        st.sampled_from([-1, 0, 1, 3, 17]),
    ),
    min_size=6,
    max_size=20,
)


def _build_rows(raw, tick: int) -> list[tuple]:
    rows, seen, t_prev = [], set(), -1
    for i, (k, sel, slot, phase) in enumerate(raw):
        pk = str(k)
        if pk not in seen:
            op = "insert"
            seen.add(pk)
        elif sel >= 4:
            op = "delete"
        else:
            op = "update"
        # boundary-seeking timestamp, forced strictly increasing so the
        # (t, seq) order equals the seq order (the feed contract)
        t = max(slot * tick + phase, 0, t_prev + 1)
        t_prev = t
        rows.append(
            (
                i,
                t,
                pk,
                op,
                ("signup", "click", "view", "purchase", "error")[sel % 5],
                float(i * 3 + sel) / 4.0,
                '{"k": %d}' % (i % 7),
            )
        )
    return rows


_OPS_SCHEMA = (
    "seq long, t long, pk string, op string, event_type string,"
    " value double, props string"
)
_OPS_COLS = ["seq", "t", "pk", "op", "event_type", "value", "props"]


def _duck(rows: list[tuple], fragment: str, select: str) -> list[tuple]:
    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=_OPS_COLS)
    con.register("src", pdf)
    out = con.execute("WITH " + fragment + select).fetchall()
    con.close()
    return sorted(out)


def _norm(v):
    return round(v, 9) if isinstance(v, float) else v


def _spark_rows(df, cols) -> list[tuple]:
    return sorted(tuple(_norm(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("tick", TICKS)
@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(workloads)
def test_polling_tick_phase_matches_twin(tick, raw):
    spark = _get_spark()
    rows = _build_rows(raw, tick)
    ops = spark.createDataFrame(rows, _OPS_SCHEMA)
    cols = [
        "poll_ts_ms", "op", "pk", "after_event_type", "after_value",
        "after_props", "ts_ms", "tx_id", "method",
    ]
    for soft, view in ((True, "polled_soft"), (False, "polled")):
        got = _spark_rows(
            capture.polling_capture_ops(
                ops, poll_ms=tick, include_soft_deletes=soft
            ).select(cols),
            cols,
        )
        want = [
            tuple(_norm(v) for v in r)
            for r in _duck(
                rows,
                poll_state_sql(tick),
                f"SELECT {', '.join(cols)} FROM {view} ORDER BY ALL",
            )
        ]
        assert got == want, f"poll_ms={tick} soft={soft}"


@pytest.mark.parametrize("tick", TICKS)
@settings(
    max_examples=4,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(workloads)
def test_log_and_trigger_tick_phase_match_twin(tick, raw):
    spark = _get_spark()
    rows = _build_rows(raw, tick)
    ops = spark.createDataFrame(rows, _OPS_SCHEMA)

    wal_cols = [
        "lsn", "op", "pk", "before_event_type", "before_value", "before_props",
        "after_event_type", "after_value", "after_props", "ts_ms", "tx_id",
        "emitted_at_ms", "method",
    ]
    got = _spark_rows(
        capture.log_capture_ops(ops, fetch_ms=tick).select(wal_cols), wal_cols
    )
    want = [
        tuple(_norm(v) for v in r)
        for r in _duck(
            rows, wal_sql(tick), f"SELECT {', '.join(wal_cols)} FROM wal ORDER BY ALL"
        )
    ]
    assert got == want, f"fetch_ms={tick}"

    audit_cols = [
        "audit_seq", "op", "pk", "before_event_type", "before_value",
        "before_props", "after_event_type", "after_value", "after_props",
        "commit_ts_ms", "tx_id", "emitted_at_ms", "method",
    ]
    got = _spark_rows(
        capture.trigger_capture_ops(ops, extract_ms=tick).select(audit_cols),
        audit_cols,
    )
    want = [
        tuple(_norm(v) for v in r)
        for r in _duck(
            rows,
            audit_sql(tick),
            f"SELECT {', '.join(audit_cols)} FROM audit ORDER BY ALL",
        )
    ]
    assert got == want, f"extract_ms={tick}"
