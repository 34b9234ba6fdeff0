"""C5 — capture-pipeline lifecycle controller.

The reference's ``CDCController`` drives IDLE → SNAPSHOTTING → TAILING →
PAUSED transitions and counts snapshot rows (``src/engine/stateMachine.ts:
16-75``; snapshot phase ``src/modes/logBased.ts:147-187``).  Spark mapping:
the snapshot is a batch union *before* the stream starts (snapshot-then-
stream handoff), tailing is the ``StreamingQuery`` lifecycle, pause/resume is
stop/restart — restart resumes from the checkpoint (or reprocesses the
source in checkpoint-less tests, which the idempotent sink absorbs).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

IDLE = "idle"
SNAPSHOTTING = "snapshotting"
TAILING = "tailing"
PAUSED = "paused"
STOPPED = "stopped"


class CDCPipeline:
    def __init__(
        self,
        snapshot_df: DataFrame | None,
        stream_df_factory: Callable[[], DataFrame],
        sink: Callable[[DataFrame, int], None],
        checkpoint: str | None = None,
    ):
        self._snapshot_df = snapshot_df
        self._stream_factory = stream_df_factory
        self._sink = sink
        self._checkpoint = checkpoint
        self._query = None
        self.state = IDLE
        self.metrics: dict[str, int] = {"snapshot_rows": 0, "starts": 0}

    def _start_query(self):
        writer = (
            self._stream_factory()
            .writeStream.outputMode("append")
            .foreachBatch(self._sink)
        )
        if self._checkpoint:
            writer = writer.option("checkpointLocation", self._checkpoint)
        return writer.start()

    def start(self) -> "CDCPipeline":
        if self.state not in (IDLE, STOPPED):
            raise RuntimeError(f"cannot start from {self.state}")
        if self._snapshot_df is not None:
            self.state = SNAPSHOTTING
            n = self._snapshot_df.count()
            self._sink(self._snapshot_df, -1)  # M10: snapshot batch first
            self.metrics["snapshot_rows"] += n
        self._query = self._start_query()
        self.metrics["starts"] += 1
        self.state = TAILING
        return self

    def drain(self) -> None:
        if self._query is not None:
            self._query.processAllAvailable()

    def pause(self) -> None:
        if self.state != TAILING:
            raise RuntimeError(f"cannot pause from {self.state}")
        self._query.stop()
        self._query = None
        self.state = PAUSED

    def resume(self) -> None:
        """Restart the tail. With a checkpoint configured, the query resumes
        from committed offsets — already-processed input is not replayed
        (exactly-once together with the idempotent sink)."""
        if self.state != PAUSED:
            raise RuntimeError(f"cannot resume from {self.state}")
        self._query = self._start_query()
        self.metrics["starts"] += 1
        self.state = TAILING

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None
        self.state = STOPPED
