"""dm_spark task runner — the `start-task` analog.

    spark-submit --py-files dm_spark.zip main.py task.yaml
    python main.py examples/task.yaml          # local mode

Task file (YAML or JSON): see `examples/task.yaml`. Modes:
- full:        batch snapshot load (dump+load units)
- incremental: tail the relay feed via Structured Streaming
- all:         snapshot, then stream from the snapshot watermark

Runtime control of a RUNNING task (dmctl analog, no restart):
    python main.py ctl <checkpoint_dir> pause|resume|stop
    python main.py ctl <checkpoint_dir> patch '{"deny_tables": [...]}'
(applied patches persist across resume; see CdcStreamDriver docs)
"""

from __future__ import annotations

import json
import sys

from dm_spark.config import TaskConfig
from dm_spark.lake import LakeTable
from dm_spark.session import get_spark
from dm_spark.task import Task, replication_lag_sec


def load_task_file(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    if path.endswith(".json"):
        return json.loads(text)
    import yaml

    return yaml.safe_load(text)


def ctl(argv: list[str]) -> int:
    """dmctl analog for a RUNNING tail/incremental task (no Spark, no
    restart — the driver polls control.json between micro-batches):

        python main.py ctl <checkpoint_dir> pause
        python main.py ctl <checkpoint_dir> resume
        python main.py ctl <checkpoint_dir> stop
        python main.py ctl <checkpoint_dir> patch '{"deny_tables": ["db.*"]}'
        python main.py ctl <checkpoint_dir> schema get <db.table>
        python main.py ctl <checkpoint_dir> schema set <db.table> 'CREATE TABLE ...'
        python main.py ctl <checkpoint_dir> schema remove <db.table>
        python main.py ctl <checkpoint_dir> binlog skip <file_seq>:<pos>
        python main.py ctl <checkpoint_dir> binlog replace <file_seq>:<pos> 'DDL' ['DDL'...]
        python main.py ctl <checkpoint_dir> binlog revert <file_seq>:<pos>

    `schema` is the operate-schema analog (dm/ctl/master/
    operate_schema.go, tests/tracker_ignored_ddl): get reads the
    runner state file directly; set/remove stage through control.json
    and apply at the next batch boundary (runner-mode tasks only).

    `binlog` is the handle-error analog (dmctl binlog skip/replace/
    revert, syncer/handle_error.go:32-73; tests/handle_error): register
    a user override at a binlog location on the running task — a task
    blocked on an unsupported DDL or poison DML (run with
    block_on_error) replays its failed batch under the new operator
    instead of needing a restart. `replace` statements are parsed by
    the engine's DDL grammar at compose time; injected actions get
    suffix ordinals at the location (Location.Suffix analog).
    """
    import os

    if len(argv) < 2:
        print(ctl.__doc__)
        return 2
    cp_dir, cmd = argv[0], argv[1]
    path = os.path.join(cp_dir, "control.json")
    # read-modify-write so commands compose: patch-while-paused then
    # resume keeps the patch for the driver to apply on restart
    try:
        with open(path) as f:
            body = json.load(f)
    except FileNotFoundError:
        body = {}
    if cmd == "pause":
        body["pause"] = True
    elif cmd == "resume":
        # resume clears BOTH pause and a previous stop: a stale
        # stop:true would otherwise make every task relaunch exit
        # immediately with zero batches (sticky stop)
        body.pop("pause", None)
        body.pop("stop", None)
    elif cmd == "stop":
        body["stop"] = True
    elif cmd == "patch":
        if len(argv) < 3:
            print(ctl.__doc__)
            return 2
        try:
            body["config_patch"] = json.loads(argv[2])
        except json.JSONDecodeError as e:
            raise SystemExit(f"ctl patch: invalid JSON ({e}): {argv[2]!r}") from e
    elif cmd == "schema":
        if len(argv) < 4:
            print(ctl.__doc__)
            return 2
        sub, table = argv[2], argv[3]
        if sub == "get":
            # no driver round-trip: the runner persists its state
            # (schemas included) next to the checkpoint every batch
            state_path = os.path.join(cp_dir, "runner_state.json")
            try:
                with open(state_path) as f:
                    schemas = json.load(f).get("schemas", {})
            except FileNotFoundError:
                raise SystemExit(
                    f"schema get: no runner state at {state_path} — the task "
                    "has not committed a batch yet, or is not in runner mode"
                ) from None
            if table not in schemas:
                raise SystemExit(f"schema get: no tracked schema for {table!r} "
                                 f"(tracked: {sorted(schemas)})")
            print(json.dumps({"table": table, "schema": schemas[table]}))
            return 0
        # each issued op carries a fresh id: the driver applies an op at
        # most once (persisted guard beside the checkpoint), so two
        # intentional issues of byte-identical content must still be
        # distinguishable
        import uuid

        if sub == "set":
            if len(argv) < 5:
                print(ctl.__doc__)
                return 2
            # refuse malformed statements HERE, before they reach
            # control.json — the driver validates again at stage time,
            # but a bad op written to the control file would loudly kill
            # the poll loop on every restart until hand-removed
            from dm_spark.schema.ddl_parser import UnsupportedDdl, parse_ddl

            try:
                evs = parse_ddl(argv[4], 0, 0)
            except UnsupportedDdl as e:
                raise SystemExit(f"schema set: statement rejected: {e}") from e
            if len(evs) != 1 or evs[0].action != "create_table":
                raise SystemExit(
                    "schema set: need a single CREATE TABLE statement, "
                    f"parsed to {[e.action for e in evs]}"
                )
            if evs[0].source_table and evs[0].source_table != table:
                raise SystemExit(
                    f"schema set: statement names {evs[0].source_table!r} "
                    f"but the op targets {table!r}"
                )
            body["schema_op"] = {
                "op": "set", "table": table, "create": argv[4],
                "id": uuid.uuid4().hex,
            }
        elif sub == "remove":
            body["schema_op"] = {
                "op": "remove", "table": table, "id": uuid.uuid4().hex,
            }
        else:
            raise SystemExit(f"unknown schema subcommand {sub}")
    elif cmd == "binlog":
        if len(argv) < 4:
            print(ctl.__doc__)
            return 2
        sub, loc = argv[2], argv[3]
        if sub not in ("skip", "replace", "revert"):
            raise SystemExit(f"unknown binlog subcommand {sub} (skip|replace|revert)")
        try:
            fs_s, pos_s = loc.split(":", 1)
            fs, pos = int(fs_s), int(pos_s)
            if fs < 0 or pos < 0:
                raise ValueError
        except ValueError:
            raise SystemExit(
                f"binlog {sub}: location must be <file_seq>:<pos> "
                f"(non-negative integers), got {loc!r}"
            ) from None
        import uuid

        op = {"op": sub, "file_seq": fs, "pos": pos, "id": uuid.uuid4().hex}
        if sub == "replace":
            sqls = argv[4:]
            if not sqls:
                print(ctl.__doc__)
                return 2
            # refuse statements the engine's grammar rejects HERE,
            # before they reach control.json (the driver validates
            # again at stage time, but a bad op in the control file
            # would loudly kill the poll loop until hand-removed)
            from dm_spark.schema.ddl_parser import UnsupportedDdl, parse_ddl

            for s in sqls:
                try:
                    if not parse_ddl(s, fs, pos):
                        raise SystemExit(
                            f"binlog replace: statement parses to no schema "
                            f"action (nothing to inject): {s!r}"
                        )
                except UnsupportedDdl as e:
                    raise SystemExit(f"binlog replace: statement rejected: {e}") from e
            op["sqls"] = list(sqls)
        body["binlog_op"] = op
    else:
        raise SystemExit(f"unknown ctl command {cmd}")
    os.makedirs(cp_dir, exist_ok=True)
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(body, f)
    os.replace(tmp, path)
    print(json.dumps({"control": body, "path": path}))
    return 0


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__)
        return 2
    if argv[1] == "ctl":
        return ctl(argv[2:])
    spec = load_task_file(argv[1])
    cfg = TaskConfig.from_dict(spec.get("task", {}))
    mode = spec.get("mode", "incremental")
    paths = spec["paths"]  # {lake, feed, checkpoint}

    spark = get_spark(
        app_name=spec.get("name", "dm_spark_task"),
        master=spec.get("master"),
        shuffle_partitions=cfg.shuffle_partitions,
    )
    lake = LakeTable(spark, paths["lake"])
    if not lake.exists:
        schema = [(c["name"], c["type"]) for c in spec["schema"]]
        lake = LakeTable.create(
            spark,
            paths["lake"],
            schema,
            cfg.key,
            n_buckets=cfg.n_buckets,
            write_mode=spec.get("write_mode", "cow"),
            unique_keys=cfg.unique_keys or None,
        )

    task = Task(spark, cfg, lake, feed_dir=paths["feed"], checkpoint_dir=paths["checkpoint"])
    if mode == "full":
        snapshot = spark.read.parquet(spec["snapshot_path"])
        v = task.run_full(snapshot)
        print(json.dumps({"mode": mode, "version": v}))
    elif mode == "incremental":
        stats = task.run_incremental(
            from_location=tuple(spec["from_location"]) if "from_location" in spec else None,
            max_files_per_trigger=spec.get("max_files_per_trigger", 4),
        )
        print(json.dumps({"mode": mode, "batches": stats}))
    elif mode == "all":
        snapshot = spark.read.parquet(spec["snapshot_path"])
        stats = task.run_all(snapshot, tuple(spec["snapshot_location"]))
        print(json.dumps({"mode": mode, "batches": stats}))
    elif mode == "replicate":
        # lake-to-lake: tail another LakeTable's change feed (CDC-out).
        # CoW sources stream their _changes dirs; MoR sources (change
        # set = delta files inside data commits) use the version-cursor
        # poll path, which admits by the committed manifest.
        from dm_spark.streaming import replicate_lake, replicate_lake_poll

        src = LakeTable(spark, spec["paths"]["src_lake"])
        if src.write_mode == "mor":
            stats = replicate_lake_poll(
                spark, src, lake, spec.get("name", "replica"),
                timeout_sec=spec.get("timeout_sec", 600),
                poll_sec=spec.get("trigger_sec"),  # None = catch-up + stop
            )
        else:
            stats = replicate_lake(
                spark, src, lake, paths["checkpoint"],
                timeout_sec=spec.get("timeout_sec", 600),
                trigger_sec=spec.get("trigger_sec"),  # None = catch-up + stop
            )
        print(json.dumps({"mode": mode, "batches": stats}))
    elif mode == "tail":
        # live production shape: tail forever (or until timeout_sec)
        stats = task.run_tail(
            trigger_sec=spec.get("trigger_sec", 1.0),
            timeout_sec=spec.get("timeout_sec", 0),
            max_files_per_trigger=spec.get("max_files_per_trigger", 4),
        )
        print(json.dumps({"mode": mode, "batches": stats}))
    else:
        raise SystemExit(f"unknown mode {mode}")

    print(
        json.dumps(
            {
                "totals": lake.totals(),
                "checkpoint": lake.global_checkpoint(),
                "lag_sec": replication_lag_sec(lake),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
