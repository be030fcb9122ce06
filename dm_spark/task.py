"""Task modes — the unit pipeline (dm/worker/subtask.go:63-94).

Mode `full`: batch snapshot load (dump+load units collapse to one
`spark.read` -> `LakeTable.overwrite`, SURVEY §2.1).
Mode `incremental`: stream the change feed from a location.
Mode `all`: snapshot, then stream from the snapshot watermark —
`createRealUnits` chaining [Dumpling, Loader, Syncer].
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dm_spark.config import TaskConfig
from dm_spark.lake import LakeTable
from dm_spark.operators import ApplyPipeline
from dm_spark.streaming import CdcStreamDriver


@dataclass
class Task:
    spark: SparkSession
    config: TaskConfig
    lake: LakeTable
    feed_dir: str
    checkpoint_dir: str

    def run_full(self, snapshot: DataFrame) -> int:
        """Full snapshot load (loader/loader.go:566 analog)."""
        return self.lake.overwrite(snapshot)

    def run_incremental(self, from_location: tuple[int, int] | None = None,
                        max_files_per_trigger: int | None = 4) -> list[dict]:
        """Tail the relay feed; `from_location` filters obsolete events
        (table-checkpoint gating, syncer/syncer.go:1983-1989) — needed
        when the snapshot already covers a prefix of the feed."""
        pipeline = ApplyPipeline(self.config)
        drv = CdcStreamDriver(
            self.spark, self.feed_dir, self.checkpoint_dir, pipeline,
            {self.config.target_table: self.lake},
            max_files_per_trigger=max_files_per_trigger,
        )
        if from_location is not None:
            # stable field, not a transform monkeypatch: a pipeline
            # swap (runtime config_patch) would silently drop a patched
            # method and re-apply pre-snapshot events
            pipeline.location_floor = from_location
        return drv.run_available_now()

    def run_all(self, snapshot: DataFrame, snapshot_location: tuple[int, int]) -> list[dict]:
        """Snapshot then catch-up stream (mode `all`)."""
        self.run_full(snapshot)
        return self.run_incremental(from_location=snapshot_location)

    def run_tail(
        self,
        trigger_sec: float = 1.0,
        timeout_sec: int = 0,
        stop_when=None,
        max_files_per_trigger: int | None = 4,
    ) -> list[dict]:
        """Live-tail mode (the production shape: the syncer's
        forever-tailing loop, syncer/syncer.go:1280): keep consuming new
        relay files on a processing-time trigger until killed
        (timeout_sec=0 → no deadline) or `stop_when(driver)` fires;
        resumes from checkpoint on restart."""
        drv = CdcStreamDriver(
            self.spark, self.feed_dir, self.checkpoint_dir,
            ApplyPipeline(self.config),
            {self.config.target_table: self.lake},
            max_files_per_trigger=max_files_per_trigger,
        )
        return drv.run_continuous(
            trigger_sec=trigger_sec,
            timeout_sec=timeout_sec if timeout_sec > 0 else 2**31,
            stop_when=stop_when,
        )


def replication_lag_sec(lake: LakeTable, now=None) -> float | None:
    """secondsBehindMaster analog — delegates to the single
    implementation on LakeTable (kept for API compatibility)."""
    return lake.replication_lag_sec(now=now)
