"""F1–F7 — filter / search / tag utilities over event and scenario frames.

DataFrame counterparts of the reference's list utilities:
- scenario filtering by AND-of-tags plus tokenized substring search over a
  label/description/tags haystack (``src/features/scenarioFilters.ts:
  177-217``);
- distinct sorted tag collection (``:235-246``);
- stable replace-or-prepend pinning of a live entry (``:184-191``);
- event-log op-kind/equality filters and token search
  (``assets/app.js:2725-2948``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_events(
    events: DataFrame,
    *,
    ops: tuple[str, ...] | None = None,
    table: str | None = None,
    pk: str | None = None,
    tx_id: str | None = None,
) -> DataFrame:
    """F1 — equality / op-kind-set filters (case-folded op codes)."""
    out = events
    if ops is not None:
        out = out.filter(F.lower(F.col("op")).isin([o.lower() for o in ops]))
    if table is not None and "tbl" in out.columns:
        out = out.filter(F.col("tbl") == table)
    if pk is not None:
        out = out.filter(F.col("pk") == pk)
    if tx_id is not None:
        out = out.filter(F.col("tx_id") == tx_id)
    return out


def search_events(events: DataFrame, query: str, haystack_cols: list[str]) -> DataFrame:
    """F2 — tokenized search: every whitespace token must appear somewhere in
    the lower-cased haystack."""
    hay = F.lower(
        F.concat_ws(" ", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in haystack_cols])
    )
    out = events
    for tok in query.lower().split():
        out = out.filter(hay.contains(tok))
    return out


def filter_scenarios(
    scenarios: DataFrame, *, tags: tuple[str, ...] = (), query: str = ""
) -> DataFrame:
    """F3 — AND-of-tags + tokenized haystack match. Expects columns
    ``(id, name, description, tags array<string>)``."""
    out = scenarios
    for tag in tags:
        out = out.filter(F.array_contains("tags", tag))
    hay = F.lower(
        F.concat_ws(
            " ",
            F.col("id"),
            F.col("name"),
            F.col("description"),
            F.array_join("tags", " "),
        )
    )
    for tok in query.lower().split():
        out = out.filter(hay.contains(tok))
    return out


def collect_tags(scenarios: DataFrame) -> DataFrame:
    """F4 — distinct sorted union of tags across scenarios."""
    return (
        scenarios.select(F.explode("tags").alias("tag")).distinct().orderBy("tag")
    )


def pin_scenario(scenarios: DataFrame, live: DataFrame) -> DataFrame:
    """F7 — replace-or-prepend the live entry: drop any stored scenario with
    the live id, put the live row first (precedence column), stable order."""
    tagged = live.withColumn("__prec", F.lit(0)).unionByName(
        scenarios.join(live.select("id"), "id", "left_anti").withColumn(
            "__prec", F.lit(1)
        )
    )
    return tagged.orderBy("__prec", "id").drop("__prec")


def sanitize_map(payload: Column) -> Column:
    """F6 — drop null/undefined fields from a payload map
    (``harness/verifier/index.js:43-57``)."""
    return F.map_filter(payload, lambda _k, v: v.isNotNull())


def parse_harness_history(lines: DataFrame, col: str = "line") -> DataFrame:
    """M9 — parse nightly-harness markdown table rows
    (``src/ui/harnessHistory.ts:80-117``): ``| date | scenario | status |``
    rows become columns; header/separator/placeholder lines are dropped."""
    c = F.col(col)
    cells = F.split(F.regexp_replace(F.trim(c), r"^\||\|$", ""), r"\|")
    is_row = (
        c.rlike(r"^\s*\|.*\|\s*$")
        & ~c.rlike(r"^\s*\|[\s:|-]+\|\s*$")  # separator
        & ~F.lower(c).contains("| date |")  # header
        & ~F.lower(c).contains("no runs")  # placeholder
    )
    return lines.filter(is_row).select(
        F.trim(F.element_at(cells, 1)).alias("run_date"),
        F.trim(F.element_at(cells, 2)).alias("scenario"),
        F.lower(F.trim(F.element_at(cells, 3))).alias("status"),
        F.when(
            F.size(cells) >= 4,
            F.regexp_extract(F.element_at(cells, 4), r"\((.*?)\)", 1),
        ).alias("report_link"),
    )
