"""Streaming driver: relay feed -> foreachBatch apply -> lake MERGE.

The syncer main loop (syncer/syncer.go:1280 `Run`) becomes a Structured
Streaming query:

- micro-batch boundary == XID/flush barrier (syncer/syncer.go:1811-1848,
  :1055-1115): every batch ends with checkpoint rows and an atomic lake
  snapshot commit, so Spark's epoch IS the flush.
- exactly-once: Spark file-source offsets (which files were read) +
  `merge_into(batch_id, stream_id)` gating on the lake side. A replayed
  batch after crash-restart is skipped by the gate; a redelivered event
  from a fresh checkpoint loses last-write-wins. Both paths keep the
  final table state identical (safe-mode analog, syncer/mode.go:26-68).
- lag metric: `now - max(applied event ts)` (secondsBehindMaster analog,
  syncer/syncer.go:802-845) recorded per batch in the lineage log.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dm_spark.lake import LakeTable
from dm_spark.operators import ApplyPipeline
from dm_spark.sources.relay import read_feed_stream


class CdcStreamDriver:
    def __init__(
        self,
        spark: SparkSession,
        feed_dir: str,
        checkpoint_dir: str,
        pipeline: ApplyPipeline,
        lakes: dict[str, LakeTable],
        max_files_per_trigger: int | None = 1,
        runner: "ReplayRunner | None" = None,
        ddl_events: list | None = None,
        compact_every: int | None = None,
        max_inline_ddl_per_batch: int = 1000,
        epoch: int = 0,
        track_txn_intervals: bool = False,
    ):
        self.spark = spark
        self.feed_dir = feed_dir
        self.checkpoint_dir = checkpoint_dir
        self.pipeline = pipeline
        self.lakes = lakes
        self.max_files_per_trigger = max_files_per_trigger
        # stream identity ties the lake's batch-id gate to this checkpoint
        self.stream_id = hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:16]
        self.batch_stats: list[dict] = []
        # DDL mode: batches route through a ReplayRunner so schema
        # actions interleave with DMLs at their exact location
        # (flush-before-DDL inside the batch); exactly-once then rests
        # on LWW + the applied-DDL location gate rather than batch ids.
        self.runner = runner
        self.ddl_events = sorted(ddl_events or [], key=lambda e: e.loc())
        # runner-mode crash durability (sharding-meta analog): restore
        # barrier/tracker/online-DDL state saved after the last batch —
        # spilled rows are already on disk, this remembers WHY they wait
        self._runner_state_path = os.path.join(checkpoint_dir, "runner_state.json")
        if self.runner is not None and os.path.exists(self._runner_state_path):
            with open(self._runner_state_path) as f:
                self.runner.restore_state(json.load(f))
        # operate-schema ops are applied at most once per issued op: the
        # last applied op is persisted beside the checkpoint so a driver
        # restart does not re-apply the op still present in control.json
        # (which would revert any schema evolution applied since)
        self._applied_schema_op_path = os.path.join(
            checkpoint_dir, "applied_schema_op.json"
        )
        self._applied_schema_op = None
        if os.path.exists(self._applied_schema_op_path):
            with open(self._applied_schema_op_path) as f:
                self._applied_schema_op = json.load(f)
        # handle-error ops (binlog skip/replace/revert) share the same
        # at-most-once-per-issued-op contract: each ctl issue carries a
        # fresh id, the last applied op persists beside the checkpoint
        self._applied_binlog_op_path = os.path.join(
            checkpoint_dir, "applied_binlog_op.json"
        )
        self._applied_binlog_op = None
        if os.path.exists(self._applied_binlog_op_path):
            with open(self._applied_binlog_op_path) as f:
                self._applied_binlog_op = json.load(f)
        # unlock-ddl-lock ops: same at-most-once contract
        self._applied_unlock_op_path = os.path.join(
            checkpoint_dir, "applied_unlock_op.json"
        )
        self._applied_unlock_op = None
        if os.path.exists(self._applied_unlock_op_path):
            with open(self._applied_unlock_op_path) as f:
                self._applied_unlock_op = json.load(f)
        # GTID-set analog (opt-in, dm_spark/lineage.py): the applied
        # txn_id interval set, folded per micro-batch and persisted
        # beside the checkpoint — a semilattice, so crash-replayed
        # batches are absorbed idempotently; `ctl status` reports any
        # gap (a transaction below the high water that never applied)
        self.track_txn_intervals = track_txn_intervals
        self._txn_intervals_path = os.path.join(checkpoint_dir, "txn_intervals.json")
        self.txn_intervals: list[list[int]] = []
        if track_txn_intervals and os.path.exists(self._txn_intervals_path):
            with open(self._txn_intervals_path) as f:
                self.txn_intervals = json.load(f)["intervals"]
        # MoR maintenance: fold delta files back into base every N
        # batches (the rewrite_data_files scheduling a table service
        # would own on a real lakehouse)
        self.compact_every = compact_every
        self.max_inline_ddl_per_batch = max_inline_ddl_per_batch
        # upstream binlog epoch (bumped by the operator after a source
        # re-master restarts file_seq) — rides every merge so the
        # reported checkpoint advances as (epoch, file_seq, pos)
        self.epoch = epoch
        if self.runner is not None:
            # runner (DDL-capable) mode merges through the runner: it
            # must carry the same epoch, or a re-mastered source's
            # reported checkpoint silently freezes at the old high
            # water in exactly the mode that needs it (ADVICE r04 #3).
            # Only thread a NON-default epoch: an operator may have set
            # runner.epoch directly (a public field), and the ctor's
            # default 0 must not silently zero it (review r5).
            if epoch:
                self.runner.epoch = epoch
            else:
                self.epoch = self.runner.epoch

    def _extract_inline_ddl(self, batch_df: DataFrame) -> list:
        """In-band DDL: relay rows with op='Q' are query events whose
        payload (the raw SQL statement — exactly the reference's
        QueryEvent.Query, syncer/syncer.go:2253 handleQueryEvent) rides
        `after.text`. They are parsed into DdlEvents here, at their
        binlog location, so a user never has to side-channel schema
        changes — ALTERs written into the feed just work. The collect is
        HARD-BOUNDED at `max_inline_ddl_per_batch` (+1 sentinel row):
        DDLs are rare by nature, but a gh-ost backfill or a migration
        replay can emit thousands of query events in one micro-batch,
        and an uncapped collect would be a driver-OOM vector — past the
        cap the driver fails loudly with the remedy (smaller
        maxFilesPerTrigger, or raise the cap) instead of silently
        ballooning (VERDICT r03 #2; the reference processes one query
        event at a time, syncer/syncer.go:2154, and cannot OOM here).
        An UnsupportedDdl statement raises unless an error operator
        skips that location (the handle-error escape hatch,
        syncer/handle_error.go)."""
        from dm_spark.schema import UnsupportedDdl, parse_ddl

        cap = self.max_inline_ddl_per_batch
        qrows = (
            batch_df.where(F.col("op") == "Q")
            .select(F.col("after.text").alias("sql"), "file_seq", "pos")
            .limit(cap + 1)
            .collect()
        )
        if len(qrows) > cap:
            raise RuntimeError(
                f"micro-batch carries more than {cap} op='Q' query events "
                "(DDL storm — gh-ost backfill or migration replay?); "
                "lower max_files_per_trigger so the batch shrinks, or "
                "raise max_inline_ddl_per_batch if the driver has memory "
                "headroom"
            )
        out = []
        for r in sorted(qrows, key=lambda r: (r["file_seq"], r["pos"])):
            try:
                out.extend(parse_ddl(r["sql"], r["file_seq"], r["pos"]))
            except UnsupportedDdl as e:
                ops = self.runner.error_ops.ops if self.runner is not None else {}
                ov = ops.get((r["file_seq"], r["pos"]))
                if ov is None:
                    # name the LOCATION and the remedy: the handle-error
                    # flow needs file_seq:pos to compose the ctl command,
                    # and this message is what `ctl status` surfaces to
                    # a blocked task's operator
                    raise UnsupportedDdl(
                        f"{e} — at binlog location "
                        f"{r['file_seq']}:{r['pos']}; skip or replace it: "
                        f"main.py ctl <checkpoint_dir> binlog skip "
                        f"{r['file_seq']}:{r['pos']}"
                    ) from e
                if ov["kind"] == "replace":
                    for i, rep in enumerate(ov["actions"]):
                        from dm_spark.plans import DdlEvent

                        out.append(DdlEvent(
                            rep["action"], rep["source_table"], r["file_seq"], r["pos"],
                            suffix=i + 1,
                            **{k: v for k, v in rep.items()
                               if k not in ("action", "source_table")},
                        ))
        return out

    def _apply(self, batch_df: DataFrame, batch_id: int) -> None:
        t_start = time.time()
        self._apply_staged_patch()  # batch boundary: swap filters here
        # persist ONLY when the batch is read more than once (runner
        # mode scans it per DDL range; multi-target scans it per lake;
        # a pruning CoW merge makes a bucket-discovery pass). The
        # common tail shape — single target, MoR append — is a single
        # pass, and caching ~100s of MB per micro-batch was pure
        # overhead (profiled: ~25% of live-tail batch time).
        multi_pass = (
            self.runner is not None
            or len(self.lakes) > 1
            # the txn-interval fold re-scans the raw batch after the merge
            or self.track_txn_intervals
        )
        if multi_pass:
            batch_df.persist()
        try:
            if self.runner is not None:
                inline = self._extract_inline_ddl(batch_df)
                mx = batch_df.agg(
                    F.max(F.struct(F.col("file_seq"), F.col("pos")))
                ).collect()[0][0]
                due = [
                    e for e in self.ddl_events
                    if mx is not None and e.loc()[:2] <= (mx["file_seq"], mx["pos"])
                ]
                self.ddl_events = self.ddl_events[len(due):]
                due = sorted([*due, *inline], key=lambda e: e.loc())
                self.runner.replay(batch_df.where(F.col("op") != "Q"), due)
                self._save_runner_state()
                self._fold_txn_intervals(batch_df)
                self.batch_stats.append({"batch_id": batch_id, "ddls": len(due)})
                return
            # plain pipeline has no DDL surface: query events drop here
            flat = self.pipeline.transform(batch_df.where(F.col("op") != "Q"))
            if multi_pass:
                flat.persist()
            pre = 16 if self.pipeline.config.salt_hot_keys else None
            for target, lake in self.lakes.items():
                part = flat.where(F.col("target_table") == target).drop("target_table")
                stats = lake.merge_into(
                    part, batch_id=batch_id, stream_id=self.stream_id,
                    pre_reduce=pre, epoch=self.epoch,
                )
                if (
                    self.compact_every
                    and not stats.skipped
                    and (batch_id + 1) % self.compact_every == 0
                ):
                    lake.compact()
                self.batch_stats.append(
                    {
                        "batch_id": batch_id,
                        "target": target,
                        "skipped": stats.skipped,
                        "n_incoming": stats.n_incoming,
                        "rows_written": stats.rows_written,
                        "lag_sec": self._lag_sec(lake),
                        "sec": round(time.time() - t_start, 3),
                    }
                )
            if multi_pass:
                flat.unpersist()
            self._fold_txn_intervals(batch_df)
        finally:
            if multi_pass:
                batch_df.unpersist()

    # ------------------------------------------------- live control file
    # dmctl's runtime task surface (pause-task / resume-task /
    # stop-task, dm/ctl/master/*.go; update-task's filter subset;
    # exercised by tests/dmctl_basic) re-expressed without a control
    # plane: a JSON file next to the checkpoint, polled by
    # run_continuous between micro-batches.
    #   {"pause": true}              pause consumption (query stopped;
    #                                resumes from checkpoint on clear)
    #   {"stop": true}               graceful stop (drain current batch)
    #   {"config_patch": {...}}      swap the FILTER family of the task
    #                                config at a batch boundary; route
    #                                rules additionally swap while PAUSED
    #                                (pause -> patch -> resume)
    #   {"binlog_op": {...}}         handle-error: register a skip/
    #                                replace/revert error operator at a
    #                                binlog location on the running task
    #                                (dmctl binlog, syncer/handle_error.go)
    #   {"unlock_op": {...}}         force-resolve a stuck pessimistic
    #                                shard-DDL lock (dmctl
    #                                unlock-ddl-lock) and drain its spill
    def control_path(self) -> str:
        return os.path.join(self.checkpoint_dir, "control.json")

    def _read_control(self) -> dict:
        try:
            with open(self.control_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}
        except json.JSONDecodeError as e:
            # a malformed control file must not be treated as "no
            # control" — the operator thinks the stream is paused.
            # Writers must write ATOMICALLY (tmp + os.replace, as
            # `main.py ctl` does): this poller runs sub-second and WILL
            # observe a partial plain-write
            raise RuntimeError(f"malformed control file {self.control_path()}: {e}") from e

    # the runtime-swappable subset: the filter family (the reference's
    # update-task + handle-error surface). Route changes are swappable
    # only while PAUSED (pause -> patch -> resume, the reference's
    # pause-task/update-task/resume-task flow, tests/dmctl_basic);
    # key/bucket changes alter merge semantics and always need a
    # restart — rejected loudly (rescale() exists for rebucketing).
    _PATCHABLE = ("allow_tables", "deny_tables", "event_filters",
                  "expr_filters", "ddl_filters")
    _PAUSED_PATCHABLE = ("routes",)

    def _validate_patch_keys(self, patch: dict, paused: bool) -> None:
        allowed = self._PATCHABLE + (self._PAUSED_PATCHABLE if paused else ())
        bad = set(patch) - set(allowed)
        if bad:
            hint = (
                "routes are swappable only while PAUSED (pause -> patch "
                "-> resume); " if "routes" in bad and not paused else ""
            )
            raise ValueError(
                f"config_patch keys {sorted(bad)} are not runtime-swappable "
                f"(allowed here: {list(allowed)}); {hint}key/bucket changes "
                "need a task restart (rescale() for rebucketing)"
            )

    def _stage_config_patch(self, ctl: dict) -> None:
        """Poll-thread side: VALIDATE and stage the patch; the actual
        pipeline swap happens at the top of the next `_apply` call (a
        true batch boundary). Swapping from the poll thread would let a
        patch land mid-batch — runner mode consults the pipeline config
        repeatedly inside one replay, so half a micro-batch would
        filter under old rules and half under new."""
        patch = ctl.get("config_patch")
        if not patch or patch == getattr(self, "_applied_patch", None):
            return
        self._validate_patch_keys(patch, paused=False)
        self._staged_patch = patch

    def _apply_staged_patch(self) -> None:
        patch = getattr(self, "_staged_patch", None)
        if patch is not None:
            self._staged_patch = None
            self._apply_config_patch({"config_patch": patch})
        sop = getattr(self, "_staged_schema_op", None)
        if sop is not None:
            self._staged_schema_op = None
            self._apply_schema_op({"schema_op": sop})
        bop = getattr(self, "_staged_binlog_op", None)
        if bop is not None:
            self._staged_binlog_op = None
            self._apply_binlog_op({"binlog_op": bop})
        uop = getattr(self, "_staged_unlock_op", None)
        if uop is not None:
            self._staged_unlock_op = None
            self._apply_unlock_op({"unlock_op": uop})

    def _stage_schema_op(self, ctl: dict) -> None:
        """Poll-thread side of operate-schema: validate shape and stage;
        the registry mutation happens at the next batch boundary (same
        mid-batch hazard as config patches — runner mode consults the
        registry repeatedly inside one replay)."""
        op = ctl.get("schema_op")
        if not op or op == getattr(self, "_applied_schema_op", None):
            return
        self._validate_schema_op(op)
        self._staged_schema_op = op

    def _validate_schema_op(self, op: dict):
        """Full validation — including parsing the CREATE — so a bad
        statement is refused at stage time in the poll thread (or at
        compose time in `main.py ctl`, which calls this grammar too),
        never first discovered inside foreachBatch where it would kill
        the live query and poison every restart. Returns the parsed
        DdlEvent for `set`, None for `remove`."""
        if self.runner is None:
            raise ValueError(
                "schema_op needs runner mode — the schema tracker lives in "
                "ReplayRunner (plain-pipeline tasks carry no per-table schemas)"
            )
        kind = op.get("op")
        if kind not in ("set", "remove"):
            raise ValueError(f"schema_op.op must be set|remove, got {kind!r}")
        if not op.get("table"):
            raise ValueError("schema_op needs a table ('db.table')")
        if kind != "set":
            return None
        if not op.get("create"):
            raise ValueError(
                "schema_op set needs 'create': a CREATE TABLE statement "
                "(the reference's operate-schema set takes a schema file "
                "holding one, dm/ctl/master/operate_schema.go:30-40)"
            )
        from dm_spark.schema.ddl_parser import parse_ddl

        evs = parse_ddl(op["create"], 0, 0)
        if len(evs) != 1 or evs[0].action != "create_table":
            raise ValueError(
                "schema_op set: 'create' must be a single CREATE TABLE "
                f"statement, parsed to {[e.action for e in evs]}"
            )
        ev = evs[0]
        # a statement naming a DIFFERENT table (copy-paste of another
        # shard's DDL) would silently install that table's shape under
        # this op's key — refuse instead of trusting the op key
        if ev.source_table and ev.source_table != op["table"]:
            raise ValueError(
                f"schema_op set: the CREATE TABLE statement names "
                f"{ev.source_table!r} but the op targets {op['table']!r} — "
                "refusing to install one table's schema under another's key"
            )
        return ev

    def _apply_schema_op(self, ctl: dict) -> None:
        """dmctl operate-schema set/remove (dm/ctl/master/
        operate_schema.go; exercised by tests/tracker_ignored_ddl):
        overwrite or drop the schema TRACKER's view of an upstream
        table when it has diverged from reality — e.g. a DDL the task's
        filters ignored upstream but whose shape the images now carry.
        `set` takes a CREATE TABLE statement (parsed by the engine's
        own DDL grammar — declared generated columns register for
        pruning, exactly as an in-stream CREATE would); `remove` drops
        the entry so the next CREATE TABLE / image re-seeds it. `get`
        needs no driver round-trip: the runner state file next to the
        checkpoint always holds the current schemas (main.py reads it).
        Applied at a batch boundary and persisted immediately (the
        reference's --flush)."""
        op = ctl.get("schema_op")
        if not op or op == getattr(self, "_applied_schema_op", None):
            return
        ev = self._validate_schema_op(op)
        table = op["table"]
        if op["op"] == "set":
            cols = [tuple(c) for c in ev.columns or []]
            # direct assignment, NOT registry.seed: seed is setdefault
            # (first-seen wins), but operate-schema set exists precisely
            # to OVERWRITE a diverged tracker view
            self.runner.registry.schemas[table] = cols
            # mirror the in-stream create_table path (plans/replay.py
            # _handle_table_ddl) exactly: columns the new CREATE declares
            # as DATA columns must stop being generated-pruned, and a
            # previously dropped table becomes live again — otherwise the
            # set reports success while merges keep pruning the column /
            # the dropped_tables gate keeps eating every DML
            target = self.runner.pipeline.config.route_of(table)
            cur = self.runner.dynamic_generated.get(target)
            if cur:
                data_cols = {c for c, _t in cols}
                cur[:] = [g for g in cur if g not in data_cols]
                if not cur:
                    self.runner.dynamic_generated.pop(target, None)
            if ev.generated:
                self.runner._register_generated(list(ev.generated), table)
            self.runner.dropped_tables.discard(table)
        else:  # remove
            self.runner.registry.schemas.pop(table, None)
        self._save_runner_state()
        self._applied_schema_op = op
        # persisted guard: schema ops are NOT idempotent (a later
        # in-stream ALTER legitimately diverges the tracker from the op's
        # snapshot), so a restart must not re-apply the op still sitting
        # in control.json — the sidecar survives the process
        tmp = f"{self._applied_schema_op_path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(op, f)
        os.replace(tmp, self._applied_schema_op_path)

    def _stage_binlog_op(self, ctl: dict) -> None:
        """Poll-thread side of `ctl binlog skip|replace|revert`: validate
        and stage; the error-operator registration happens at the next
        batch boundary (runner mode consults error_ops repeatedly inside
        one replay — same mid-batch hazard as config patches)."""
        op = ctl.get("binlog_op")
        if not op or op == self._applied_binlog_op:
            return
        self._validate_binlog_op(op)
        self._staged_binlog_op = op

    def _validate_binlog_op(self, op: dict):
        """Full validation — including parsing every replacement SQL —
        so a bad op is refused at stage time (or at compose time in
        `main.py ctl`, which runs the same grammar), never first
        discovered inside foreachBatch. Returns the parsed replacement
        action dicts for `replace`, None otherwise."""
        if self.runner is None:
            raise ValueError(
                "binlog_op needs runner mode — error operators live in "
                "ReplayRunner (plain-pipeline tasks have no DDL/skip surface)"
            )
        kind = op.get("op")
        if kind not in ("skip", "replace", "revert"):
            raise ValueError(f"binlog_op.op must be skip|replace|revert, got {kind!r}")
        fs, pos = op.get("file_seq"), op.get("pos")
        if not (isinstance(fs, int) and isinstance(pos, int) and fs >= 0 and pos >= 0):
            raise ValueError(
                f"binlog_op needs integer file_seq/pos >= 0, got ({fs!r}, {pos!r})"
            )
        if kind != "replace":
            return None
        sqls = op.get("sqls")
        if not sqls or not isinstance(sqls, list):
            raise ValueError(
                "binlog_op replace needs 'sqls': a non-empty list of DDL "
                "statements to inject at the location (the reference's "
                "handle-error replace, syncer/handle_error.go:32-73)"
            )
        from dm_spark.schema.ddl_parser import UnsupportedDdl, parse_ddl

        actions = []
        for sql in sqls:
            try:
                evs = parse_ddl(sql, fs, pos)
            except UnsupportedDdl as e:
                raise ValueError(
                    f"binlog_op replace: statement rejected by the DDL "
                    f"grammar ({e}): {sql!r}"
                ) from e
            for ev in evs:
                act = {"action": ev.action, "source_table": ev.source_table}
                for k in ("column", "new_name", "new_type", "target_table",
                          "columns", "key", "unique_keys", "generated"):
                    v = getattr(ev, k)
                    if v is not None:
                        act[k] = v
                actions.append(act)
        if not actions:
            raise ValueError("binlog_op replace: sqls parsed to zero actions")
        return actions

    def _apply_binlog_op(self, ctl: dict) -> None:
        """dmctl `binlog skip|replace|revert` (handle-error,
        syncer/handle_error.go:32-73; match/apply
        syncer/err-operator/operator.go:60-173): register a user
        override at a binlog location on the RUNNING task, so a task
        blocked on an unsupported DDL or a poison DML is unblocked
        without a restart — the replayed micro-batch consults the
        operator at the failing location (skip drops the event, replace
        injects the supplied statements with suffix ordinals). Applied
        at a batch boundary, persisted in the runner state (error_ops
        survive restarts) plus an at-most-once sidecar keyed by the op
        id (a later in-stream revert must not be undone by the stale op
        still sitting in control.json after a driver restart)."""
        op = ctl.get("binlog_op")
        if not op or op == self._applied_binlog_op:
            return
        actions = self._validate_binlog_op(op)
        fs, pos = op["file_seq"], op["pos"]
        if op["op"] == "skip":
            self.runner.error_ops.set_skip(fs, pos)
        elif op["op"] == "replace":
            self.runner.error_ops.set_replace(fs, pos, actions)
        else:  # revert
            self.runner.error_ops.revert(fs, pos)
        self._save_runner_state()
        self._applied_binlog_op = op
        tmp = f"{self._applied_binlog_op_path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(op, f)
        os.replace(tmp, self._applied_binlog_op_path)

    def _stage_unlock_op(self, ctl: dict) -> None:
        op = ctl.get("unlock_op")
        if not op or op == self._applied_unlock_op:
            return
        self._validate_unlock_op(op)
        self._staged_unlock_op = op

    def _validate_unlock_op(self, op: dict) -> None:
        """Shape-only validation: the LOCK's existence is checked at
        apply time (it may resolve naturally between stage and apply —
        a stale unlock is recorded, not fatal)."""
        if self.runner is None or self.runner.barrier is None:
            raise ValueError(
                "unlock_op needs a runner with a pessimistic shard-DDL "
                "barrier (no locks exist on this task)"
            )
        if not op.get("target"):
            raise ValueError("unlock_op needs a target table")
        ident = op.get("ident")
        if not isinstance(ident, dict) or not ident.get("action"):
            raise ValueError(
                "unlock_op needs 'ident': the locked DDL's identity dict "
                "(the `ddl` field of a ctl ddl-locks entry)"
            )
        fs, pos = op.get("file_seq"), op.get("pos")
        if not (isinstance(fs, int) and isinstance(pos, int) and fs >= 0 and pos >= 0):
            raise ValueError(
                f"unlock_op needs integer file_seq/pos >= 0 (where the "
                f"forced DDL is stamped), got ({fs!r}, {pos!r})"
            )

    def _apply_unlock_op(self, ctl: dict) -> None:
        """dmctl unlock-ddl-lock (dm/ctl/master/unlock_ddl_lock.go):
        force-resolve a stuck pessimistic shard-DDL lock at a batch
        boundary — exec (default) applies the DDL now and releases;
        skip releases without applying. A lock that resolved naturally
        between issue and apply is recorded in batch_stats instead of
        failing the task (the op is then spent)."""
        op = ctl.get("unlock_op")
        if not op or op == self._applied_unlock_op:
            return
        self._validate_unlock_op(op)
        try:
            res = self.runner.force_unlock(
                op["target"], op["ident"], op["file_seq"], op["pos"],
                exec_ddl=op.get("exec", True),
            )
            # drain NOW: on an idle tail no micro-batch may fire for a
            # while, and the whole point of the unlock is releasing the
            # spilled DMLs the lock was holding back
            res["drained"] = self.runner.drain_pending()
            self.batch_stats.append({"unlock_op": op.get("id"), **res})
        except ValueError as e:
            # EVERY designed refusal spends the op: a lock that resolved
            # naturally, OR an apply-time refusal (key-column rename,
            # expr-filter collision). Letting the refusal escape
            # foreachBatch would kill the query with the op still in
            # control.json — every restart would re-crash until it was
            # hand-removed (review r5). Recorded loudly instead; the
            # operator re-issues a corrected op (fresh id).
            why = (
                "lock_already_resolved"
                if "no pending shard-DDL lock" in str(e)
                else f"refused: {e}"
            )
            self.batch_stats.append({"unlock_op": op.get("id"), "result": why})
        self._save_runner_state()
        self._applied_unlock_op = op
        tmp = f"{self._applied_unlock_op_path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(op, f)
        os.replace(tmp, self._applied_unlock_op_path)

    def _apply_config_patch(self, ctl: dict, paused: bool = False) -> None:
        import copy

        from dm_spark.config import (
            DdlFilterRule,
            EventFilterRule,
            ExprFilterRule,
            RouteRule,
        )
        from dm_spark.operators import ApplyPipeline

        patch = ctl.get("config_patch")
        if not patch or patch == getattr(self, "_applied_patch", None):
            return
        self._validate_patch_keys(patch, paused=paused)
        cfg = copy.deepcopy(self.pipeline.config)
        if "routes" in patch:
            cfg.routes = [RouteRule(**r) for r in patch["routes"]]
            # a route to a target with no lake would silently DROP every
            # routed row (the merge loop only writes known targets).
            # STRICT even in runner+lake_root mode (review r5): runner
            # auto-create only fires on a CREATE TABLE event, which
            # never arrives for an already-existing table — so a patch
            # re-routing live tables to a lake-less target would drop
            # their rows forever while looking accepted. Routes to
            # not-yet-created tables belong in the task-start config.
            known = set(self.lakes)
            if self.runner is not None:
                known |= set(self.runner.lakes)
            unknown = {r.target for r in cfg.routes} - known
            if unknown:
                raise ValueError(
                    f"route patch targets {sorted(unknown)} have no lake in "
                    "this task — pre-create the lake and register it, or "
                    "restart the task with the new route (runner mode "
                    "auto-creates lakes only when the target's CREATE TABLE "
                    "arrives in-stream)"
                )
        if "allow_tables" in patch:
            cfg.allow_tables = list(patch["allow_tables"])
        if "deny_tables" in patch:
            cfg.deny_tables = list(patch["deny_tables"])
        if "event_filters" in patch:
            cfg.event_filters = [EventFilterRule(**r) for r in patch["event_filters"]]
        if "expr_filters" in patch:
            cfg.expr_filters = [ExprFilterRule(**r) for r in patch["expr_filters"]]
        if "ddl_filters" in patch:
            cfg.ddl_filters = [DdlFilterRule(**r) for r in patch["ddl_filters"]]
        # swapping the reference is atomic; the next micro-batch reads
        # the new pipeline. The location floor (snapshot-watermark gate)
        # carries over — it is task state, not filter config
        self.pipeline = ApplyPipeline(cfg, location_floor=self.pipeline.location_floor)
        if self.runner is not None:
            self.runner.pipeline = self.pipeline
        self._applied_patch = patch

    def _save_runner_state(self) -> None:
        """Atomic write-then-rename after each runner batch: the state
        on disk is always the state as of SOME completed batch; a crash
        mid-batch replays that batch from the stream checkpoint against
        the matching coordination state (merges are LWW-idempotent)."""
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        tmp = f"{self._runner_state_path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(self.runner.state_json(), f)
        os.replace(tmp, self._runner_state_path)

    def _fold_txn_intervals(self, batch_df: DataFrame) -> None:
        """Opt-in GTID-set analog: fold this batch's applied txn_id
        intervals into the persisted set (dm_spark/lineage.py).
        Interval union is a semilattice, so a crash anywhere between
        the lake merge, this write, and the stream-checkpoint commit
        replays the batch into an identical set — the file on disk is
        always a correct LOWER BOUND of what was applied, and gaps
        below the high water are real holes, never write-ordering
        artifacts. Query events fold too (a GTID covers DDL
        transactions)."""
        if not self.track_txn_intervals:
            return
        from dm_spark.lineage import batch_txn_intervals, merge_intervals

        self.txn_intervals = merge_intervals(
            self.txn_intervals, batch_txn_intervals(batch_df)
        )
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        tmp = f"{self._txn_intervals_path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"intervals": self.txn_intervals}, f)
        os.replace(tmp, self._txn_intervals_path)

    @staticmethod
    def _lag_sec(lake: LakeTable) -> float | None:
        return lake.replication_lag_sec()

    def run_available_now(self, timeout_sec: int = 600) -> list[dict]:
        """Drain everything currently in the relay dir, then stop
        (Trigger.AvailableNow — the incremental-catchup mode). Ops
        already pending in control.json (schema_op / binlog_op issued
        against a stopped task) stage before the first batch, so a
        crashed task relaunched in drain mode replays its failed batch
        under the new operators."""
        self._write_blocked_sidecar(None)  # stale from a killed blocked run
        ctl = self._read_control()
        self._stage_schema_op(ctl)
        self._stage_binlog_op(ctl)
        self._stage_unlock_op(ctl)
        stream = read_feed_stream(self.spark, self.feed_dir, self.max_files_per_trigger)
        q = (
            stream.writeStream.foreachBatch(self._apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
        if self.runner is not None and self.ddl_events:
            # side-channel DDLs located past the feed's last event: the
            # per-batch due-filter (loc <= batch max) never reaches
            # them, and silently discarding a scheduled ALTER at drain
            # would leave the schema wrong with no signal — the drained
            # stream IS their flush point
            trailing, self.ddl_events = self.ddl_events, []
            for ev in trailing:
                self.runner.handle_ddl(ev)
            self.runner.drain_pending()
            self._save_runner_state()
            self.batch_stats.append({"batch_id": None, "ddls": len(trailing), "trailing": True})
        return self.batch_stats

    def _checkpoint_settled(self) -> bool:
        """True iff Spark's commit log has caught up with its offset
        log — no planned-but-uncommitted micro-batch will replay on the
        next start."""
        import os

        def latest(sub: str) -> int:
            d = os.path.join(self.checkpoint_dir, sub)
            try:
                ids = [int(f) for f in os.listdir(d) if f.isdigit()]
            except FileNotFoundError:
                return -1
            return max(ids, default=-1)

        return latest("offsets") == latest("commits")

    _STAGED_ATTRS = ("_staged_patch", "_staged_schema_op",
                     "_staged_binlog_op", "_staged_unlock_op")

    def _settle_inflight(self) -> None:
        """Replay the interrupted (planned-but-uncommitted) micro-batch
        under the CURRENT pipeline config and stop — a single
        trigger-once run re-executes exactly the batch in the offset
        log (the lake batch-id gates make the re-merge idempotent),
        leaving offsets == commits so a route patch cannot re-route an
        in-flight batch mid-replay.

        Ops STAGED by the poll loop before the pause are suspended for
        the duration: the settle batch's own `_apply_staged_patch`
        would otherwise consume them FIRST, replaying the batch under
        the new schema/filters/operators — the exact hazard settling
        exists to prevent (review r5; an op genuinely needed to get the
        settle batch through — a binlog skip on a poison event — was
        already applied directly from control.json by the paused
        branch)."""
        staged = [getattr(self, a, None) for a in self._STAGED_ATTRS]
        for a in self._STAGED_ATTRS:
            setattr(self, a, None)
        try:
            stream = read_feed_stream(
                self.spark, self.feed_dir, self.max_files_per_trigger
            )
            q = (
                stream.writeStream.foreachBatch(self._apply)
                .option("checkpointLocation", self.checkpoint_dir)
                .trigger(once=True)
                .start()
            )
            q.awaitTermination(120)
        finally:
            for a, v in zip(self._STAGED_ATTRS, staged):
                setattr(self, a, v)

    def run_continuous(
        self,
        trigger_sec: float = 1.0,
        timeout_sec: int = 600,
        stop_when=None,
        poll_sec: float = 0.25,
        block_on_error: bool = False,
    ) -> list[dict]:
        """Live-tail mode: the forever-tailing syncer loop
        (syncer/syncer.go:1280 `Run`) as a processing-time-triggered
        stream over the relay dir — new relay files are picked up as
        they appear, each micro-batch commits checkpoint + lineage
        atomically. Idle periods need no extra flush: the checkpoint is
        bound to data batches, so there is nothing unflushed when no
        events arrive (the reference needs a heartbeat-driven flush,
        syncer/syncer.go:1849-1857, only because its checkpoint lags its
        appliers). `stop_when(driver) -> bool` is polled driver-side for
        tests/ops; production omits it and tails until killed, resuming
        from checkpoint.

        The control file (see :meth:`control_path`) is polled at the
        same cadence: `pause` stops the streaming query (checkpoint
        intact) and idles until cleared, then restarts from the same
        checkpoint — dmctl pause-task/resume-task without killing the
        process; `stop` exits gracefully; `config_patch` swaps the
        filter family of the task config at a batch boundary.

        `block_on_error=True` is the reference's paused-on-error task
        state (a failed subtask stays resumable, dm/worker/subtask.go):
        when a micro-batch fails (unsupported DDL, poison DML), the
        driver records the error on `self.last_error`, sets
        `self.blocked`, and idles polling control.json instead of
        propagating — the operator unblocks it with `main.py ctl <cp>
        binlog skip|replace <loc>` (the handle-error flow) or any other
        control change, and the failed batch replays from checkpoint
        under the new operators. Default False keeps failures loud."""
        t0 = time.time()
        self.paused = False
        self.blocked = False
        self.last_error = None
        # a SIGKILL while blocked skips the finally that clears the
        # sidecar — a restarted task must not report blocked-on-error
        # from a previous life
        self._write_blocked_sidecar(None)
        done = False
        while not done and time.time() - t0 < timeout_sec:
            ctl = self._read_control()
            if ctl.get("stop"):
                break
            if ctl.get("pause"):
                self.paused = True
                # paused = the update-task window: the full patch
                # surface (filters + routes) applies here, before any
                # batch can run under the new rules — the reference's
                # pause-task -> update-task -> resume-task flow.
                # A pause can interrupt a micro-batch AFTER its lake
                # commit but BEFORE Spark's commit log — that batch
                # replays on resume, and under NEW routes the redirected
                # rows would land in a second lake whose batch-id gate
                # has never seen them (double-apply). Settle the
                # interrupted batch under the OLD routes first
                # (review r5).
                # binlog ops apply BEFORE any settle: the in-flight
                # batch may be the poison one the op exists to fix —
                # settling it first would just crash again (error ops
                # are location-surgical; applying early never harms)
                self._apply_binlog_op(ctl)
                patch = ctl.get("config_patch")
                sop = ctl.get("schema_op")
                uop = ctl.get("unlock_op")
                needs_settle = (
                    patch
                    and "routes" in patch
                    and patch != getattr(self, "_applied_patch", None)
                ) or (
                    # schema ops mutate the registry the replayed batch
                    # reads — same hazard as a route change (review r5)
                    sop
                    and sop != self._applied_schema_op
                ) or (
                    # unlock ops must run AFTER the interrupted batch
                    # settles: replaying it afterwards would re-announce
                    # the just-unlocked DDL and resurrect the lock, with
                    # the spent at-most-once op unable to re-fire
                    # (review r5)
                    uop
                    and uop != self._applied_unlock_op
                )
                ctl_key = json.dumps(ctl, sort_keys=True)
                if (
                    needs_settle
                    and ctl_key == getattr(self, "_settle_failed_ctl", None)
                ):
                    # the settle already failed under THIS exact control
                    # state: idle until the operator changes something
                    # instead of replaying the poison batch every poll
                    # tick (~4 Hz of full query startups; review r5)
                    time.sleep(poll_sec)
                    continue
                if needs_settle and not self._checkpoint_settled():
                    try:
                        self._settle_inflight()
                        self._settle_failed_ctl = None
                        if getattr(self, "_settle_blocked", False):
                            self._settle_blocked = False
                            self._write_blocked_sidecar(None)
                    except Exception as err:  # noqa: BLE001
                        # the in-flight batch itself is the failing one.
                        # A pending SCHEMA op is the designed remedy for
                        # exactly this (operate-schema on a blocked task:
                        # the batch is SUPPOSED to replay under the fixed
                        # registry) — apply it and let resume retry. A
                        # route/unlock change on an unsettleable batch
                        # stays REFUSED: applying it would re-route /
                        # re-announce the uncommitted batch — so stay
                        # paused with the error surfaced instead of
                        # crashing the whole tail (review r5-2).
                        self._settle_blocked = True
                        if sop and sop != self._applied_schema_op:
                            self._write_blocked_sidecar(
                                f"settle failed ({err}); applying pending "
                                "schema op — batch replays under the fixed "
                                "registry on resume"
                            )
                            self._apply_schema_op(ctl)
                            # the op changed the registry: the retry on
                            # the next tick is the designed replay-under-
                            # fixed-registry, so no idle gate here
                        else:
                            self._write_blocked_sidecar(
                                f"in-flight batch cannot settle: {err} — "
                                "route patch / unlock refused; fix the "
                                "failing batch first (ctl binlog "
                                "skip/replace or ctl schema set), or stop"
                            )
                            self._settle_failed_ctl = ctl_key
                        time.sleep(poll_sec)
                        continue
                self._apply_config_patch(ctl, paused=True)
                self._apply_schema_op(ctl)
                self._apply_unlock_op(ctl)
                time.sleep(poll_sec)
                continue
            self.paused = False
            self._settle_failed_ctl = None
            if getattr(self, "_settle_blocked", False):
                # operator resumed past a failed settle: the stale
                # cannot-settle sidecar must not outlive the pause
                self._settle_blocked = False
                self._write_blocked_sidecar(None)
            self._apply_config_patch(ctl)
            # ops already sitting in control.json are staged BEFORE the
            # stream starts, so the FIRST (possibly replayed) micro-batch
            # sees them — the restart half of the handle-error flow: a
            # task that crashed on a poison location, got a `ctl binlog
            # skip` issued, and was relaunched must not crash again on
            # the replay racing the poll thread's first stage
            self._stage_schema_op(ctl)
            self._stage_binlog_op(ctl)
            self._stage_unlock_op(ctl)
            stream = read_feed_stream(
                self.spark, self.feed_dir, self.max_files_per_trigger
            )
            q = (
                stream.writeStream.foreachBatch(self._apply)
                .option("checkpointLocation", self.checkpoint_dir)
                .trigger(processingTime=f"{max(trigger_sec, 0.1)} seconds")
                .start()
            )
            err = None
            stop_req = False
            try:
                while q.isActive and time.time() - t0 < timeout_sec:
                    if stop_when is not None and stop_when(self):
                        stop_req = True
                        break
                    ctl = self._read_control()
                    if ctl.get("stop"):
                        stop_req = True
                        break
                    if ctl.get("pause"):
                        break  # stop the query; outer loop idles until cleared
                    self._stage_config_patch(ctl)
                    self._stage_schema_op(ctl)
                    self._stage_binlog_op(ctl)
                    self._stage_unlock_op(ctl)
                    time.sleep(poll_sec)
                else:
                    done = True  # query died or overall timeout
            finally:
                q.stop()
                try:
                    q.awaitTermination(60)
                except Exception as e:  # StreamingQueryException
                    if not block_on_error or stop_req:
                        raise
                    err = e
            if stop_req:
                done = True
            elif err is not None:
                # paused-on-error: idle until the operator intervenes,
                # then retry the batch from checkpoint. Wakes on any
                # control.json CHANGE, and also on an op already sitting
                # there unapplied — one issued while the batch was
                # failing (before the snapshot below) must not be missed
                # until timeout (review r5)
                done = False
                self.last_error = str(err)
                self.blocked = True
                self._write_blocked_sidecar(str(err))
                try:
                    snap = self._read_control()
                    while True:
                        if time.time() - t0 >= timeout_sec:
                            raise err  # nobody intervened — stay loud
                        ctl = self._read_control()
                        if (
                            ctl.get("stop")
                            or ctl != snap
                            or self._pending_intervention(ctl)
                        ):
                            break
                        time.sleep(poll_sec)
                finally:
                    self.blocked = False
                    self._write_blocked_sidecar(None)
        return self.batch_stats

    def _pending_intervention(self, ctl: dict) -> bool:
        """An op present in control.json that this driver has not yet
        applied — the blocked-task wake condition."""
        return bool(
            (ctl.get("binlog_op") and ctl["binlog_op"] != self._applied_binlog_op)
            or (ctl.get("unlock_op") and ctl["unlock_op"] != self._applied_unlock_op)
            or (ctl.get("schema_op") and ctl["schema_op"] != self._applied_schema_op)
            or (
                ctl.get("config_patch")
                and ctl["config_patch"] != getattr(self, "_applied_patch", None)
            )
        )

    def _write_blocked_sidecar(self, error: str | None) -> None:
        """Persist the blocked-on-error state beside the checkpoint so
        `main.py ctl status` can tell a blocked task (and the failing
        error) apart from a slow or dead one — the state the whole
        handle-error flow pivots on (review r5). None clears it."""
        path = os.path.join(self.checkpoint_dir, "blocked.json")
        if error is None:
            try:
                os.remove(path)
            except FileNotFoundError:
                pass
            return
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"blocked": True, "error": error, "at": time.time()}, f)
        os.replace(tmp, path)
