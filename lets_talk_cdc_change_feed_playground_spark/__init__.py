"""PySpark-native CDC change-feed analytics engine.

A from-scratch Spark engine with the data-processing capabilities of the
reference CDC playground (sandgraal/Lets-Talk-CDC-Change-Feed-Playground):
deterministic CDC capture-mode semantics (log / polling / trigger), change
event streams with transactions/offsets/partitions, stateful consumer apply,
divergence verification analytics (multiset diff, ordering, lag percentiles,
state convergence), plus the large-scale training-data pipeline operators
(exact/MinHash/SimHash dedup, similarity search, text analysis).

See ``COVERAGE.md`` for the operator-by-operator map to SURVEY.md §2 and the
oracle-checked query surface (``registry.queries()``).

Everything is DataFrame-in / DataFrame-out and declarative so Catalyst can
optimize: predicate pushdown, column pruning, broadcast joins, AQE.
"""

from lets_talk_cdc_change_feed_playground_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
