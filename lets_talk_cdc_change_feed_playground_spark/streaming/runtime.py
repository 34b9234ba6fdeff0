"""Shared runtime knobs for the judged streaming jobs.

One definition so the stream modules can't drift: every stateful operator
pays a per-PARTITION state-store open/commit per trigger, so at judged data
sizes the partition count is overhead, not parallelism.  Before the keyed
folds were bucketed (``capture.CAPTURE_BUCKETS``) 16 partitions won (the
per-key Python groups needed spreading); with bucketed state the measured
sweet spot at sf0.1 moved to 4 (full stream family: 16 → 92.8 s,
8 → 83.5 s, 4 → 73.2 s; 2 loses — per-batch join parallelism starts to
starve).  A real topic with real volume raises it via
``SPARK_GRAFT_STREAM_PARTS`` — the operator logic is partition-count-
agnostic, and state scales out with partitions exactly like any keyed
Spark state.
"""

from __future__ import annotations

import os

STREAM_PARTS = int(os.environ.get("SPARK_GRAFT_STREAM_PARTS", "4"))
