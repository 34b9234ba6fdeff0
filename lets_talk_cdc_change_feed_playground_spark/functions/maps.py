"""Conf-independent MAP merge: the JS object-spread ``{...a, ...b}``.

``map_concat`` alone depends on ``spark.sql.mapKeyDedupPolicy=LAST_WIN``;
filtering the overlapping keys out of the base first gives identical
last-write-wins semantics under any session conf.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def empty_map() -> Column:
    return F.expr("map()").cast("map<string,string>")


def null_map() -> Column:
    return F.expr("CAST(NULL AS MAP<STRING,STRING>)")


def merge_maps(acc: Column, patch: Column) -> Column:
    """``{...acc, ...patch}`` — overlapping keys are filtered from the base
    before the concat, so the merge works under any caller's session."""
    a = F.coalesce(acc, empty_map())
    p = F.coalesce(patch, empty_map())
    return F.map_concat(F.map_filter(a, lambda k, _v: ~F.map_contains_key(p, k)), p)
