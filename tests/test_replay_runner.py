"""ReplayRunner integration: interleaved DML/DDL replay with
flush-before-DDL, online-DDL swap, error operators, and the
pessimistic barrier with pending-DML spill (the shardddl / online_ddl
/ handle_error suite analogs)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dm_spark.config import RouteRule, TaskConfig
from dm_spark.feed import ENVELOPE_DDL
from dm_spark.lake import LakeTable
from dm_spark.operators import ApplyPipeline
from dm_spark.plans import DdlEvent, ReplayRunner
from dm_spark.streaming.ddl_coordinator import PendingSpill, ShardDdlBarrier

SCHEMA = [
    ("conv_id", "string"),
    ("turn_idx", "int"),
    ("role", "string"),
    ("text", "string"),
    ("tool", "string"),
    ("ts", "timestamp"),
]
KEY = ["conv_id", "turn_idx"]


def T(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def ev(spark, rows):
    """rows: (op, conv, turn, text, table, file_seq, pos)"""
    data = []
    for op, conv, turn, text, table, fs, pos in rows:
        img = (conv, turn, "user", text, None, T(pos))
        data.append(
            (
                op,
                img if op != "I" else None,
                img if op != "D" else None,
                table,
                fs,
                pos,
                T(pos),
                pos // 10,
            )
        )
    return spark.createDataFrame(data, ENVELOPE_DDL)


@pytest.fixture()
def runner(spark, tmp_path):
    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.t", target="transcripts")])
    lake = LakeTable.create(spark, str(tmp_path / "lake"), SCHEMA, KEY, n_buckets=4)
    return ReplayRunner(
        pipeline=ApplyPipeline(cfg),
        lake=lake,
        barrier=ShardDdlBarrier(groups={"transcripts": ["shard_0.t", "shard_1.t"]}),
        spill=PendingSpill(spark, str(tmp_path / "pending")),
    )


def rows(lake):
    return sorted(
        (r.conv_id, r.turn_idx, r.text) for r in lake.read().select("conv_id", "turn_idx", "text").collect()
    )


def test_flush_before_ddl_and_evolution(spark, runner):
    feed = ev(
        spark,
        [
            ("I", "a", 1, "v1", "shard_0.t", 0, 1),
            ("I", "b", 1, "v1", "shard_1.t", 0, 2),
            ("U", "a", 1, "v2", "shard_0.t", 0, 5),
        ],
    )
    ddls = [
        DdlEvent("add_column", "shard_0.t", 0, 3, column="rating", new_type="int"),
        DdlEvent("add_column", "shard_1.t", 0, 4, column="rating", new_type="int"),
    ]
    runner.replay(feed, ddls)
    assert rows(runner.lake) == [("a", 1, "v2"), ("b", 1, "v1")]
    assert "rating" in runner.lake.read().columns
    # the DDL applied exactly once (barrier: second announce released it)
    assert len(runner.applied_ddl) == 1


def test_barrier_spills_and_drains(spark, runner):
    """shard_0 announces the DDL first; its subsequent DMLs spill until
    shard_1 catches up, then drain — final state includes them."""
    feed = ev(
        spark,
        [
            ("I", "a", 1, "v1", "shard_0.t", 0, 1),
            ("I", "a", 2, "post-ddl-0", "shard_0.t", 0, 5),  # after shard_0's DDL
            ("I", "b", 1, "v1", "shard_1.t", 0, 6),
        ],
    )
    ddls = [
        DdlEvent("add_column", "shard_0.t", 0, 2, column="rating", new_type="int"),
        DdlEvent("add_column", "shard_1.t", 0, 7, column="rating", new_type="int"),
    ]
    runner.replay(feed, ddls)
    got = rows(runner.lake)
    assert ("a", 2, "post-ddl-0") in got and ("b", 1, "v1") in got
    assert len(runner.applied_ddl) == 1


def test_online_ddl_ghost_swap(spark, runner):
    feed = ev(
        spark,
        [
            ("I", "a", 1, "v1", "shard_0.t", 0, 1),
            ("I", "zz", 9, "ghost-noise", "shard_0._t_gho", 0, 2),  # must be dropped
        ],
    )
    ddls = [
        DdlEvent("add_column", "shard_0._t_gho", 0, 3, column="rating", new_type="int"),
        DdlEvent("rename_table", "shard_0._t_gho", 0, 4, target_table="shard_0.t"),
    ]
    # disable barrier for this one (single shard)
    runner.barrier = None
    runner.replay(feed, ddls)
    assert rows(runner.lake) == [("a", 1, "v1")]  # ghost DML dropped...
    assert "rating" in runner.lake.read().columns  # ...but its DDL replayed on swap


def test_error_operator_replace(spark, runner):
    runner.barrier = None
    runner.error_ops.set_replace(
        0, 3, [{"action": "add_column", "column": "rating2", "new_type": "string"}]
    )
    feed = ev(spark, [("I", "a", 1, "v1", "shard_0.t", 0, 1)])
    ddls = [DdlEvent("add_column", "shard_0.t", 0, 3, column="bad", new_type="json")]
    runner.replay(feed, ddls)
    cols = runner.lake.read().columns
    assert "rating2" in cols and "bad" not in cols


def test_suffix_keeps_later_ddls_applicable(spark, runner):
    """Replacement events at (0,3) get suffix ordinals 1,2 — they must
    NOT obsolete the genuine DDL at (0,4). The old pos*1000+i encoding
    inflated the applied location past every later pos in the file
    (pkg/binlog/position.go:298-317 keeps Suffix a separate component;
    VERDICT r01 'What's wrong' #1)."""
    runner.barrier = None
    runner.error_ops.set_replace(
        0,
        3,
        [
            {"action": "add_column", "column": "r1", "new_type": "int"},
            {"action": "add_column", "column": "r2", "new_type": "int"},
        ],
    )
    feed = ev(spark, [("I", "a", 1, "v1", "shard_0.t", 0, 1)])
    ddls = [
        DdlEvent("add_column", "shard_0.t", 0, 3, column="bad", new_type="json"),
        DdlEvent("add_column", "shard_0.t", 0, 4, column="later", new_type="int"),
    ]
    runner.replay(feed, ddls)
    cols = runner.lake.read().columns
    assert {"r1", "r2", "later"} <= set(cols) and "bad" not in cols
    locs = [
        (d["file_seq"], d["pos"], d.get("suffix", 0))
        for d in runner.lake.applied_ddl_log()
    ]
    assert locs == [(0, 3, 1), (0, 3, 2), (0, 4, 0)]


def test_suffix_after_online_ddl_swap(spark, runner):
    """Ghost-buffered DDLs replayed at the swap location must not
    obsolete a later genuine DDL either (plans/replay.py rename_table
    used the same pos*1000 encoding)."""
    runner.barrier = None
    feed = ev(spark, [("I", "a", 1, "v1", "shard_0.t", 0, 1)])
    ddls = [
        DdlEvent("add_column", "shard_0._t_gho", 0, 3, column="rating", new_type="int"),
        DdlEvent("rename_table", "shard_0._t_gho", 0, 4, target_table="shard_0.t"),
        DdlEvent("add_column", "shard_0.t", 0, 5, column="later", new_type="int"),
    ]
    runner.replay(feed, ddls)
    cols = runner.lake.read().columns
    assert {"rating", "later"} <= set(cols)


def test_optimistic_shard_ddl_mode(spark, tmp_path):
    """Optimistic mode (pkg/shardddl/optimism/lock.go:43-380): shard_0
    announces add_column; the runner joins the group's schemas and
    ALTERs the lake immediately — no barrier, stream stays live, and
    shard_1 (still writing the old shape) keeps merging. shard_1's later
    identical DDL derives nothing."""
    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.t", target="transcripts")])
    lake = LakeTable.create(spark, str(tmp_path / "lake_o"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(
        pipeline=ApplyPipeline(cfg),
        lake=lake,
        optimistic_group=["shard_0.t", "shard_1.t"],
    )
    feed = ev(
        spark,
        [
            ("I", "a", 1, "v1", "shard_0.t", 0, 1),
            ("I", "b", 1, "v1", "shard_1.t", 0, 2),
            # after shard_0's DDL, BOTH shards keep writing (shard_1 lags)
            ("U", "a", 1, "v2", "shard_0.t", 0, 5),
            ("I", "b", 2, "lagging-shape", "shard_1.t", 0, 6),
        ],
    )
    ddls = [DdlEvent("add_column", "shard_0.t", 0, 3, column="rating", new_type="int")]
    runner.replay(feed, ddls)
    assert "rating" in lake.read().columns
    assert rows(lake) == [("a", 1, "v2"), ("b", 1, "v1"), ("b", 2, "lagging-shape")]
    # derived ALTER applied exactly once, at the announcing DDL's location
    assert [(d["action"], d["file_seq"], d["pos"]) for d in lake.applied_ddl_log()] == [
        ("add_column", 0, 3)
    ]
    # the straggler announcing the same DDL later derives nothing
    got = runner.handle_ddl(
        DdlEvent("add_column", "shard_1.t", 0, 9, column="rating", new_type="int")
    )
    assert got == [] and len(lake.applied_ddl_log()) == 1


def test_optimistic_widen_joins_to_widest(spark, tmp_path):
    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.t", target="transcripts")])
    lake = LakeTable.create(spark, str(tmp_path / "lake_w"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(
        pipeline=ApplyPipeline(cfg), lake=lake,
        optimistic_group=["shard_0.t", "shard_1.t"],
    )
    runner.handle_ddl(
        DdlEvent("widen_type", "shard_0.t", 0, 3, column="turn_idx", new_type="bigint")
    )
    types = {f["name"]: f["type"] for f in lake.schema_fields()}
    assert types["turn_idx"] == "bigint"


def test_ddl_filter_rules(spark, tmp_path):
    """Binlog DDL filters (syncer/filter.go:30-120): drop_column ignored
    by kind; rename blocked by action regex; add passes through."""
    from dm_spark.config import DdlFilterRule

    cfg = TaskConfig(
        routes=[RouteRule(pattern="shard_*.t", target="transcripts")],
        ddl_filters=[
            DdlFilterRule(pattern="shard_*.t", ignore_kinds=["drop_column"]),
            DdlFilterRule(pattern="shard_0.*", action_regex="^rename_column tool"),
        ],
    )
    lake = LakeTable.create(spark, str(tmp_path / "lake_f"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=lake)
    assert runner.handle_ddl(DdlEvent("drop_column", "shard_0.t", 0, 1, column="role")) == []
    assert runner.handle_ddl(
        DdlEvent("rename_column", "shard_0.t", 0, 2, column="tool", new_name="tool_name")
    ) == []
    applied = runner.handle_ddl(
        DdlEvent("add_column", "shard_0.t", 0, 3, column="rating", new_type="int")
    )
    assert len(applied) == 1
    cols = {f["name"] for f in lake.schema_fields()}
    assert "role" in cols and "tool" in cols and "rating" in cols


def test_multi_target_runner_routes_quarantine(spark, tmp_path):
    """Rows routed to a second target must land there through the
    DDL-mode runner (VERDICT r01 missing #6: _to_target_shape silently
    dropped them)."""
    cfg = TaskConfig(
        routes=[
            RouteRule(pattern="shard_9.*", target="quarantine"),
            RouteRule(pattern="shard_*.t", target="transcripts"),
        ]
    )
    main = LakeTable.create(spark, str(tmp_path / "lake_m"), SCHEMA, KEY, n_buckets=4)
    quar = LakeTable.create(spark, str(tmp_path / "lake_q"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(
        pipeline=ApplyPipeline(cfg), lakes={"transcripts": main, "quarantine": quar}
    )
    feed = ev(
        spark,
        [
            ("I", "a", 1, "good", "shard_0.t", 0, 1),
            ("I", "z", 1, "sus", "shard_9.t", 0, 2),
        ],
    )
    runner.replay(feed, [DdlEvent("add_column", "shard_0.t", 0, 3, column="rating", new_type="int")])
    assert rows(main) == [("a", 1, "good")]
    assert rows(quar) == [("z", 1, "sus")]
    # the DDL routed to the transcripts lake only
    assert "rating" in main.read().columns and "rating" not in quar.read().columns


def test_ddl_filter_applies_to_swap_replay(spark, tmp_path):
    """A rule ignoring drop_column must also suppress it when the same
    action arrives buffered through a gh-ost swap replay (ADVICE r02:
    the rename_table branch bypassed _ddl_filtered)."""
    from dm_spark.config import DdlFilterRule

    cfg = TaskConfig(
        routes=[RouteRule(pattern="shard_*.t", target="transcripts")],
        ddl_filters=[DdlFilterRule(pattern="shard_*.t", ignore_kinds=["drop_column"])],
    )
    lake = LakeTable.create(spark, str(tmp_path / "lake_sf"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=lake)
    ddls = [
        DdlEvent("drop_column", "shard_0._t_gho", 0, 2, column="role"),
        DdlEvent("add_column", "shard_0._t_gho", 0, 3, column="rating", new_type="int"),
        DdlEvent("rename_table", "shard_0._t_gho", 0, 4, target_table="shard_0.t"),
    ]
    runner.replay(ev(spark, [("I", "a", 1, "v1", "shard_0.t", 0, 1)]), ddls)
    cols = {f["name"] for f in lake.schema_fields()}
    assert "role" in cols  # drop suppressed through the swap
    assert "rating" in cols  # non-filtered buffered DDL still replayed


def test_pipeline_splits_on_configured_key(spark, tmp_path):
    """ApplyPipeline must split key-moving updates on the TASK's key,
    not the feed default (ADVICE r02: flatten_changes was called
    without key=c.key, so a conv_id-keyed task never split updates
    that move conv_id)."""
    cfg = TaskConfig(
        key=["conv_id"],
        routes=[RouteRule(pattern="shard_*.t", target="transcripts")],
    )
    old = ("a", 1, "user", "v1", None, T(1))
    new = ("b", 1, "user", "v1", None, T(1))
    env = spark.createDataFrame(
        [("U", old, new, "shard_0.t", 0, 5, T(5), 0)],
        __import__("dm_spark.feed", fromlist=["ENVELOPE_DDL"]).ENVELOPE_DDL,
    )
    flat = ApplyPipeline(cfg).transform(env)
    got = sorted((r.op, r.conv_id) for r in flat.collect())
    assert got == [("D", "a"), ("U", "b")]


def test_drop_table_leaves_group_and_filters_dml(spark, runner):
    """DROP TABLE on a shard member: it leaves the barrier group (its
    absence must not block the group's next DDL), its tracked schema is
    dropped, and its later DMLs are filtered — the reference's
    LeaveGroup + DeleteTablePoint (syncer/syncer.go:2306-2317)."""
    feed = ev(
        spark,
        [
            ("I", "a", 1, "v1", "shard_0.t", 0, 1),
            ("I", "b", 1, "v1", "shard_1.t", 0, 2),
            ("I", "zz", 9, "after-drop", "shard_1.t", 0, 5),  # post-drop DML
        ],
    )
    ddls = [
        DdlEvent("drop_table", "shard_1.t", 0, 3),
        # only shard_0 remains: its lone announce must now satisfy the barrier
        DdlEvent("add_column", "shard_0.t", 0, 4, column="rating", new_type="int"),
    ]
    runner.replay(feed, ddls)
    got = rows(runner.lake)
    assert ("a", 1, "v1") in got and ("b", 1, "v1") in got
    assert ("zz", 9, "after-drop") not in got  # dropped source filtered
    assert "rating" in runner.lake.read().columns  # barrier shrank to 1 member
    assert runner.barrier.groups["transcripts"] == ["shard_0.t"]


def test_truncate_filtered_in_shard_group(spark, runner):
    """TRUNCATE of a shard-group member is filtered (the reference logs
    and skips in both shard modes, syncer/syncer.go:2318-2321)."""
    feed = ev(spark, [("I", "a", 1, "v1", "shard_0.t", 0, 1)])
    runner.replay(feed, [DdlEvent("truncate_table", "shard_0.t", 0, 2)])
    assert rows(runner.lake) == [("a", 1, "v1")]  # survived


def test_truncate_ungrouped_truncates_target(spark, runner):
    runner.barrier = None
    feed = ev(spark, [("I", "a", 1, "v1", "shard_0.t", 0, 1)])
    runner.apply_dml_batch(feed)
    assert rows(runner.lake) == [("a", 1, "v1")]
    runner.handle_ddl(DdlEvent("truncate_table", "shard_0.t", 0, 2))
    assert rows(runner.lake) == []
    # table keeps working after the truncate
    runner.apply_dml_batch(ev(spark, [("I", "c", 1, "v2", "shard_0.t", 0, 9)]))
    assert rows(runner.lake) == [("c", 1, "v2")]


def test_truncate_suppressed_by_filter_rule(spark, tmp_path):
    """A rule ignoring truncate_table decides the outcome — the
    'shard truncates mid-feed and the rule set decides' scenario."""
    from dm_spark.config import DdlFilterRule

    cfg = TaskConfig(
        routes=[RouteRule(pattern="shard_*.t", target="transcripts")],
        ddl_filters=[DdlFilterRule(pattern="shard_*.t", ignore_kinds=["truncate_table"])],
    )
    lake = LakeTable.create(spark, str(tmp_path / "lake_tf"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=lake)
    runner.apply_dml_batch(ev(spark, [("I", "a", 1, "v1", "shard_0.t", 0, 1)]))
    assert runner.handle_ddl(DdlEvent("truncate_table", "shard_0.t", 0, 2)) == []
    assert rows(lake) == [("a", 1, "v1")]


def test_create_table_seeds_registry_and_lake(spark, tmp_path):
    from dm_spark.schema.ddl_parser import parse_ddl

    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.n", target="new_table")])
    anchor = LakeTable.create(spark, str(tmp_path / "anchor"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(
        pipeline=ApplyPipeline(cfg),
        lakes={"transcripts": anchor},
        lake_root=str(tmp_path / "root"),
    )
    evs = parse_ddl(
        "CREATE TABLE shard_0.n (id BIGINT, u VARCHAR(8), PRIMARY KEY (id), "
        "UNIQUE KEY (u))",
        0, 1,
    )
    applied = runner.handle_ddl(evs[0])
    assert applied and "new_table" in runner.lakes
    created = runner.lakes["new_table"]
    assert [(f["name"], f["type"]) for f in created.schema_fields()] == [
        ("id", "bigint"), ("u", "string")
    ]
    assert created._load_meta().key == ["id"]
    assert created._load_meta().unique_keys == [["u"]]
    assert runner.registry.get("shard_0.n") == [("id", "bigint"), ("u", "string")]


def test_error_operator_skips_poison_dml(spark, runner):
    """A skip operator at a DML location drops exactly that row event
    (syncer/handle_error.go:32-73 binlog-position skip) — final state
    matches a replay without the poison event."""
    runner.barrier = None
    runner.error_ops.set_skip(0, 2)  # the poison row
    feed = ev(
        spark,
        [
            ("I", "a", 1, "v1", "shard_0.t", 0, 1),
            ("I", "poison", 1, "boom", "shard_0.t", 0, 2),
            ("U", "a", 1, "v2", "shard_0.t", 0, 3),
        ],
    )
    runner.apply_dml_batch(feed)
    assert rows(runner.lake) == [("a", 1, "v2")]
    # reverting the operator restores normal flow at that location
    assert runner.error_ops.revert(0, 2)
    runner.apply_dml_batch(ev(spark, [("I", "b", 1, "v1", "shard_0.t", 0, 9)]))
    got = rows(runner.lake)
    assert ("b", 1, "v1") in got and ("poison", 1, "boom") not in got


def test_drop_database_expands_to_group_members(spark, runner):
    """DROP DATABASE drops every known table of that schema
    (dropSchemaInSharding, syncer/syncer.go:2301-2306): both shard_0.t
    members... here schemas differ per shard, so drop shard_1 only."""
    from dm_spark.schema.ddl_parser import parse_ddl

    feed = ev(
        spark,
        [
            ("I", "a", 1, "v1", "shard_0.t", 0, 1),
            ("I", "b", 1, "v1", "shard_1.t", 0, 2),
        ],
    )
    runner.apply_dml_batch(feed)
    evs = parse_ddl("DROP DATABASE shard_1", 0, 3)
    applied = runner.handle_ddl(evs[0])
    assert [a["table"] for a in applied] == ["shard_1.t"]
    assert runner.barrier.groups["transcripts"] == ["shard_0.t"]
    assert "shard_1.t" in runner.dropped_tables
    # shard_1's later DMLs are filtered
    runner.apply_dml_batch(ev(spark, [("I", "z", 9, "late", "shard_1.t", 0, 9)]))
    assert ("z", 9, "late") not in rows(runner.lake)


def test_table_points_gate_resync(spark, tmp_path):
    """Per-table checkpoints (syncer/checkpoint.go TablePoint;
    IsOlderThanTablePoint gate syncer/syncer.go:1983-1989): a resync
    over an already-applied range is filtered per table before the
    merge — only genuinely new locations contribute rows."""
    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.t", target="transcripts")])
    lake = LakeTable.create(spark, str(tmp_path / "lake_tp"), SCHEMA, KEY, n_buckets=4)
    r1 = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=lake, track_table_points=True)
    r1.apply_dml_batch(
        ev(
            spark,
            [
                ("I", "a", 1, "v1", "shard_0.t", 0, 1),
                ("I", "a", 2, "v1", "shard_0.t", 0, 2),
                ("I", "b", 1, "v1", "shard_1.t", 0, 3),
            ],
        ),
        batch_id=0,
    )
    assert lake.table_checkpoints() == {"shard_0.t": [0, 2], "shard_1.t": [0, 3]}

    # fresh runner (restart), same lake: resync redelivers an old range
    r2 = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=lake, track_table_points=True)
    resync = ev(
        spark,
        [
            ("U", "a", 2, "stale-redelivery", "shard_0.t", 0, 2),  # <= point
            ("I", "a", 3, "new", "shard_0.t", 0, 9),  # past the point
        ],
    )
    r2.apply_dml_batch(resync, batch_id=None)
    # only the new row reached the merge (the gate, not LWW, dropped the old)
    assert lake.lineage_log()[-1]["n_incoming"] == 1
    got = rows(lake)
    assert ("a", 3, "new") in got and ("a", 2, "v1") in got
    assert lake.table_checkpoints()["shard_0.t"] == [0, 9]


def test_drop_while_spilled_gates_drain(spark, runner):
    """A DROP TABLE arriving while the table's DMLs sit spilled behind
    the barrier must gate the drain too — otherwise the dropped
    table's rows apply after the fact (the drain path previously
    bypassed the admission gates)."""
    feed = ev(
        spark,
        [
            ("I", "a", 1, "v1", "shard_0.t", 0, 1),
            ("I", "a", 2, "spilled-then-dropped", "shard_0.t", 0, 5),
            ("I", "b", 1, "v1", "shard_1.t", 0, 6),
        ],
    )
    ddls = [
        # shard_0 announces first: its later DMLs spill
        DdlEvent("add_column", "shard_0.t", 0, 2, column="rating", new_type="int"),
        # while spilled, shard_0 is dropped
        DdlEvent("drop_table", "shard_0.t", 0, 7),
    ]
    runner.replay(feed, ddls)
    got = rows(runner.lake)
    assert ("a", 1, "v1") in got and ("b", 1, "v1") in got
    assert ("a", 2, "spilled-then-dropped") not in got


def test_drop_releases_pending_barrier_ddl(spark, runner):
    """LeaveGroup re-evaluation: shard_0 announced a DDL and waits on
    shard_1; shard_1 is DROPPED — the pending DDL is now satisfied by
    the remaining members and must apply (plus shard_0's spilled rows
    drain under the evolved schema)."""
    feed = ev(
        spark,
        [
            ("I", "a", 1, "v1", "shard_0.t", 0, 1),
            ("I", "a", 2, "post-ddl", "shard_0.t", 0, 5),  # spills behind barrier
        ],
    )
    ddls = [
        DdlEvent("add_column", "shard_0.t", 0, 2, column="rating", new_type="int"),
        DdlEvent("drop_table", "shard_1.t", 0, 7),  # the laggard leaves
    ]
    runner.replay(feed, ddls)
    assert "rating" in runner.lake.read().columns  # pending DDL released
    got = rows(runner.lake)
    assert ("a", 1, "v1") in got and ("a", 2, "post-ddl") in got  # drained
    assert runner.barrier.blocked_sources() == set()


def test_state_roundtrip_resumes_mid_barrier(spark, tmp_path):
    """Sharding-meta durability (syncer/sharding-meta/shardmeta.go): a
    runner killed while shard_0's DDL waits on shard_1 must resume from
    persisted state — the restored barrier remembers the announce, the
    laggard's DDL releases it, and the spilled rows drain under the
    evolved schema. Without restore, the pending DDL is forgotten and
    the spill orphans."""
    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.t", target="transcripts")])
    lake = LakeTable.create(spark, str(tmp_path / "lake"), SCHEMA, KEY, n_buckets=4)
    spill_dir = str(tmp_path / "spill")

    def make():
        return ReplayRunner(
            pipeline=ApplyPipeline(cfg), lake=lake,
            barrier=ShardDdlBarrier(
                groups={"transcripts": ["shard_0.t", "shard_1.t"]}
            ),
            spill=PendingSpill(spark, spill_dir),
        )

    r1 = make()
    r1.replay(
        ev(spark, [
            ("I", "a", 1, "v1", "shard_0.t", 0, 1),
            ("I", "a", 2, "post-ddl", "shard_0.t", 0, 5),  # spills
        ]),
        [DdlEvent("add_column", "shard_0.t", 0, 2, column="rating", new_type="int")],
    )
    assert r1.barrier.blocked_sources() == {"shard_0.t"}
    state = r1.state_json()

    # "crash": brand-new runner, same config + spill path, restored state
    r2 = make()
    r2.restore_state(state)
    assert r2.barrier.blocked_sources() == {"shard_0.t"}
    r2.replay(
        ev(spark, [("I", "b", 1, "v1", "shard_1.t", 0, 7)]),
        [DdlEvent("add_column", "shard_1.t", 0, 6, column="rating", new_type="int")],
    )
    got = rows(lake)
    assert ("a", 2, "post-ddl") in got and ("b", 1, "v1") in got
    assert "rating" in lake.read().columns
    assert r2.barrier.blocked_sources() == set()


def test_state_loses_spill_without_restore(spark, tmp_path):
    """The negative control: the same crash WITHOUT restore forgets the
    first shard's announce, so the laggard's DDL opens a NEW one-sided
    barrier — the ALTER never applies and the laggard's own rows wedge
    behind it — this is the hole state_json exists to close."""
    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.t", target="transcripts")])
    lake = LakeTable.create(spark, str(tmp_path / "lake"), SCHEMA, KEY, n_buckets=4)
    spill_dir = str(tmp_path / "spill")

    def make():
        return ReplayRunner(
            pipeline=ApplyPipeline(cfg), lake=lake,
            barrier=ShardDdlBarrier(groups={"transcripts": ["shard_0.t", "shard_1.t"]}),
            spill=PendingSpill(spark, spill_dir),
        )

    r1 = make()
    r1.replay(
        ev(spark, [("I", "a", 2, "post-ddl", "shard_0.t", 0, 5)]),
        [DdlEvent("add_column", "shard_0.t", 0, 2, column="rating", new_type="int")],
    )
    r2 = make()  # amnesiac restart
    r2.replay(
        ev(spark, [("I", "b", 1, "v1", "shard_1.t", 0, 7)]),
        [DdlEvent("add_column", "shard_1.t", 0, 6, column="rating", new_type="int")],
    )
    assert "rating" not in lake.read().columns  # the ALTER never applied
    assert ("b", 1, "v1") not in rows(lake)  # the laggard's row is wedged
    assert r2.barrier.blocked_sources() == {"shard_1.t"}


def test_restored_barrier_remembers_dropped_member(spark, tmp_path):
    """Groups are not static config: DROP TABLE shrinks them. A restore
    that rebuilt the barrier from the constructor's FULL groups would
    make the next shard DDL wait forever on the departed member; the
    persisted groups must win."""
    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.t", target="transcripts")])
    lake = LakeTable.create(spark, str(tmp_path / "lake"), SCHEMA, KEY, n_buckets=4)
    spill_dir = str(tmp_path / "spill")

    def make():
        return ReplayRunner(
            pipeline=ApplyPipeline(cfg), lake=lake,
            barrier=ShardDdlBarrier(groups={"transcripts": ["shard_0.t", "shard_1.t"]}),
            spill=PendingSpill(spark, spill_dir),
        )

    r1 = make()
    r1.replay(
        ev(spark, [("I", "a", 1, "v1", "shard_0.t", 0, 1)]),
        [DdlEvent("drop_table", "shard_1.t", 0, 3)],  # member leaves
    )
    state = r1.state_json()

    r2 = make()  # constructor has the FULL group again
    r2.restore_state(state)
    assert r2.barrier.groups["transcripts"] == ["shard_0.t"]
    # a single-member announce must now apply immediately, not wait on
    # the resurrected ghost member
    r2.replay(
        ev(spark, [("I", "a", 2, "post", "shard_0.t", 0, 5)]),
        [DdlEvent("add_column", "shard_0.t", 0, 4, column="rating", new_type="int")],
    )
    assert "rating" in lake.read().columns
    assert ("a", 2, "post") in rows(lake)
    assert r2.barrier.blocked_sources() == set()


def test_duplicate_ddl_releases_barrier_then_drop_is_clean(spark, runner):
    """A shard DDL delivered twice (replay) gates as obsolete on the
    second pass — the barrier entry must release anyway; otherwise a
    later member DROP would re-report it 'done' via shrink() and
    re-apply a completed action (KeyError on an already-renamed
    column)."""
    ddl = DdlEvent("rename_column", "shard_0.t", 0, 2, column="tool", new_name="tool2")
    ddl_b = DdlEvent("rename_column", "shard_1.t", 0, 3, column="tool", new_name="tool2")
    feed = ev(spark, [("I", "a", 1, "v1", "shard_0.t", 0, 1)])
    runner.replay(feed, [ddl, ddl_b])          # applies once
    runner.replay(feed.limit(0), [ddl, ddl_b])  # duplicate delivery: obsolete
    assert runner.barrier.announced.get("transcripts", {}) == {}
    # the member drop must not resurrect the completed rename
    runner.replay(feed.limit(0), [DdlEvent("drop_table", "shard_1.t", 0, 9)])
    assert "tool2" in runner.lake.read().columns


def test_drop_database_gates_route_only_tables(spark, tmp_path):
    """DROP DATABASE must gate tables of the schema the runner never
    tracked (known only through a route pattern): a redelivered
    pre-drop DML for such a table must not apply afterwards."""
    cfg = TaskConfig(routes=[RouteRule(pattern="mydb.*", target="transcripts")])
    lake = LakeTable.create(spark, str(tmp_path / "lake"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=lake)
    runner.replay(ev(spark, [("I", "a", 1, "v1", "mydb.t1", 0, 1)]), [])
    runner.replay(ev(spark, []), [DdlEvent("drop_database", "mydb", 0, 5)])
    # redelivery of the old DML after the schema drop
    runner.replay(ev(spark, [("I", "b", 1, "late", "mydb.t1", 0, 2)]), [])
    assert ("b", 1, "late") not in rows(lake)
    # persisted + restored state keeps the gate
    r2 = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=lake)
    r2.restore_state(runner.state_json())
    assert r2.dropped_schemas == {"mydb"}


def test_drop_database_suppressed_by_filter_keeps_replicating(spark, tmp_path):
    """A DdlFilterRule ignoring the drop must suppress the
    dropped_schemas DML gate too — otherwise the user's ignore rule
    silently stops replication for the whole schema (ADVICE r03 #4)."""
    from dm_spark.config import DdlFilterRule

    cfg = TaskConfig(
        routes=[RouteRule(pattern="mydb.*", target="transcripts")],
        ddl_filters=[DdlFilterRule(pattern="mydb", ignore_kinds=["drop_database"])],
    )
    lake = LakeTable.create(spark, str(tmp_path / "lake_ddf"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=lake)
    runner.replay(ev(spark, [("I", "a", 1, "v1", "mydb.t1", 0, 1)]), [])
    runner.replay(ev(spark, []), [DdlEvent("drop_database", "mydb", 0, 5)])
    assert runner.dropped_schemas == set()
    runner.replay(ev(spark, [("I", "b", 1, "after", "mydb.t1", 1, 1)]), [])
    assert ("b", 1, "after") in rows(lake)


def test_drop_database_skip_operator_keeps_replicating(spark, tmp_path):
    """A skip error-operator at the drop's location suppresses the gate
    the same way (handle-error skip, syncer/handle_error.go:32-73)."""
    cfg = TaskConfig(routes=[RouteRule(pattern="mydb.*", target="transcripts")])
    lake = LakeTable.create(spark, str(tmp_path / "lake_dds"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=lake)
    runner.error_ops.set_skip(0, 5)
    runner.replay(ev(spark, [("I", "a", 1, "v1", "mydb.t1", 0, 1)]), [])
    runner.replay(ev(spark, []), [DdlEvent("drop_database", "mydb", 0, 5)])
    assert runner.dropped_schemas == set()
    runner.replay(ev(spark, [("I", "b", 1, "after", "mydb.t1", 1, 1)]), [])
    assert ("b", 1, "after") in rows(lake)


def test_expr_filter_refuses_rename_of_referenced_column(spark, tmp_path):
    """Expression-filter × DDL parity (VERDICT r03 #3): the reference
    recompiles expr filters after each DDL and fails on a now-missing
    column (syncer/syncer.go:2758). Here a mid-stream rename of a column
    an expr filter references must refuse LOUDLY — silently the renamed
    field decodes as NULL and the filter stops matching forever."""
    from dm_spark.config import ExprFilterRule

    cfg = TaskConfig(
        routes=[RouteRule(pattern="shard_*.t", target="transcripts")],
        expr_filters=[
            ExprFilterRule(pattern="shard_*.t", insert_expr="after.tool = 'debug'")
        ],
    )
    lake = LakeTable.create(spark, str(tmp_path / "lake_xf"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=lake)
    with pytest.raises(ValueError, match="expression filter.*tool.*renamed"):
        runner.handle_ddl(
            DdlEvent("rename_column", "shard_0.t", 0, 3, column="tool",
                     new_name="tool_name")
        )
    # a rename the filter does NOT reference applies normally
    applied = runner.handle_ddl(
        DdlEvent("rename_column", "shard_0.t", 0, 4, column="role",
                 new_name="speaker")
    )
    assert [a["action"] for a in applied] == ["rename_column"]
    # and a filter on an unrelated table pattern does not block either
    cfg2 = TaskConfig(
        routes=[RouteRule(pattern="shard_*.t", target="transcripts")],
        expr_filters=[
            ExprFilterRule(pattern="other_db.*", insert_expr="after.tool = 'x'")
        ],
    )
    lake2 = LakeTable.create(spark, str(tmp_path / "lake_xf2"), SCHEMA, KEY, n_buckets=4)
    runner2 = ReplayRunner(pipeline=ApplyPipeline(cfg2), lake=lake2)
    applied = runner2.handle_ddl(
        DdlEvent("rename_column", "shard_0.t", 0, 3, column="tool",
                 new_name="tool_name")
    )
    assert [a["action"] for a in applied] == ["rename_column"]


def test_replace_operator_honored_on_lifecycle_ddl(spark, tmp_path):
    """A replace operator at a table-lifecycle location must apply its
    replacement actions INSTEAD of the original statement (previously
    the replacement list was discarded and the truncate ran anyway)."""
    cfg = TaskConfig(routes=[RouteRule(pattern="mydb.*", target="transcripts")])
    lake = LakeTable.create(spark, str(tmp_path / "lake_rep"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=lake)
    runner.replay(ev(spark, [("I", "a", 1, "v1", "mydb.t1", 0, 1)]), [])
    runner.error_ops.set_replace(
        0, 5, [{"action": "add_column", "column": "extra", "new_type": "int"}]
    )
    applied = runner.handle_ddl(DdlEvent("truncate_table", "mydb.t1", 0, 5))
    assert [a["action"] for a in applied] == ["add_column"]
    assert ("a", 1, "v1") in rows(lake)  # NOT truncated
    assert "extra" in lake.read().columns


def test_barrier_requires_spill(spark, tmp_path):
    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.t", target="transcripts")])
    lake = LakeTable.create(spark, str(tmp_path / "lake"), SCHEMA, KEY, n_buckets=4)
    with pytest.raises(ValueError, match="PendingSpill"):
        ReplayRunner(
            pipeline=ApplyPipeline(cfg), lake=lake,
            barrier=ShardDdlBarrier(groups={"transcripts": ["shard_0.t"]}),
        )


def test_add_unique_key_refused_on_ladder_tables_noop_on_plain(spark, tmp_path):
    """ADD UNIQUE (parsed as add_unique_key): advisory no-op on a
    plain-PK table (no physical index on a lake), REFUSED loudly on a
    declared-ladder table — identity strings are hashed into bucket
    ids, so extending the ladder mid-stream would re-identify rows."""
    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.t", target="transcripts")])
    plain = LakeTable.create(spark, str(tmp_path / "lake_pl"), SCHEMA, KEY, n_buckets=4)
    r1 = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=plain)
    ev_uk = DdlEvent("add_unique_key", "shard_0.t", 0, 3,
                     unique_keys=[["role", "text"]])
    assert r1.handle_ddl(ev_uk) == []  # advisory no-op

    ladder = LakeTable.create(
        spark, str(tmp_path / "lake_ld"), SCHEMA, KEY, n_buckets=4,
        unique_keys=[["conv_id", "ts"]],
    )
    r2 = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=ladder)
    with pytest.raises(ValueError, match="immutable"):
        r2.handle_ddl(ev_uk)
    # the error-op escape hatch still works
    r2.error_ops.set_skip(0, 3)
    assert r2.handle_ddl(ev_uk) == []


def test_generated_column_add_registers_and_dmls_keep_applying(spark, tmp_path):
    """VERDICT r04 #3: 'ADD COLUMN ... GENERATED ALWAYS AS (...)' lands
    mid-stream and replication CONTINUES — the column registers as
    generated-and-pruned (syncer/dml.go:358-395: values are never
    replicated), later images are pruned of it, and the registration
    survives a state round-trip (driver restart)."""
    from dm_spark.schema.ddl_parser import parse_ddl

    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.t", target="transcripts")])
    lake = LakeTable.create(spark, str(tmp_path / "lake_gen"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=lake)
    feed = ev(
        spark,
        [
            ("I", "a", 1, "v1", "shard_0.t", 0, 1),
            ("I", "b", 1, "v1", "shard_0.t", 0, 9),
            ("U", "a", 1, "v2", "shard_0.t", 0, 12),
        ],
    )
    # upstream declares `tool` generated at (0,5): the parser output
    # feeds straight into the runner (no error operator needed)
    # images CARRY a tool value — it must never land downstream
    import pyspark.sql.functions as F

    feed = feed.withColumn(
        "after",
        F.when(
            F.col("after").isNotNull(),
            F.col("after").withField("tool", F.lit("SHOULD_NOT_LAND")),
        ),
    )
    ddls = parse_ddl(
        "ALTER TABLE shard_0.t ADD COLUMN tool VARCHAR(64) "
        "GENERATED ALWAYS AS (upper(role)) STORED",
        0, 5,
    )
    assert [e.action for e in ddls] == ["add_generated_column"]
    runner.replay(feed, ddls)
    # registration is scoped to the declaring table's TARGET — a
    # name-global registration would prune same-named DATA columns on
    # every other table in the task (review r5)
    assert runner.dynamic_generated == {"transcripts": ["tool"]}
    # the target-shaped merge frame PRUNES the generated column
    flat = runner.pipeline.transform(feed)
    assert "tool" not in runner._to_target_shape(flat, "transcripts").columns
    # ...every DML applied (replication never halted), value withheld
    assert rows(lake) == [("a", 1, "v2"), ("b", 1, "v1")]
    tools = {r.tool for r in lake.read().select("tool").collect()}
    assert tools == {None}
    # crash durability: a fresh runner restores the registration
    state = runner.state_json()
    assert state["generated_columns"] == {"transcripts": ["tool"]}
    cfg2 = TaskConfig(routes=[RouteRule(pattern="shard_*.t", target="transcripts")])
    runner2 = ReplayRunner(pipeline=ApplyPipeline(cfg2), lake=lake)
    runner2.restore_state(state)
    assert runner2.dynamic_generated == {"transcripts": ["tool"]}
    # legacy (pre-scoping) list-form state still restores, to the old
    # name-global semantics it was written under
    runner3 = ReplayRunner(
        pipeline=ApplyPipeline(
            TaskConfig(routes=[RouteRule(pattern="shard_*.t", target="transcripts")])
        ),
        lake=lake,
    )
    runner3.restore_state({**state, "generated_columns": ["tool"]})
    assert "tool" in runner3.pipeline.config.generated_columns


def test_generated_column_prune_is_target_scoped(spark, tmp_path):
    """Review r5: a generated-column DDL on ONE table must not prune a
    same-named DATA column from a table routed to a DIFFERENT target —
    that would silently null-fill real data on every upsert."""
    from dm_spark.schema.ddl_parser import parse_ddl

    cfg = TaskConfig(
        routes=[
            RouteRule(pattern="shard_*.t", target="transcripts"),
            RouteRule(pattern="db.users", target="users"),
        ]
    )
    lakes = {
        "transcripts": LakeTable.create(
            spark, str(tmp_path / "lk_t"), SCHEMA, KEY, n_buckets=2
        ),
        "users": LakeTable.create(
            spark, str(tmp_path / "lk_u"), SCHEMA, KEY, n_buckets=2
        ),
    }
    runner = ReplayRunner(pipeline=ApplyPipeline(cfg), lakes=lakes)
    # upstream declares `text` generated on shard_0.t ONLY
    ddls = parse_ddl(
        "ALTER TABLE shard_0.t ADD COLUMN text TEXT GENERATED ALWAYS "
        "AS ('x') STORED", 0, 1,
    )
    feed = ev(
        spark,
        [
            ("I", "a", 1, "gen-value", "shard_0.t", 0, 2),
            ("I", "u", 1, "real-data", "db.users", 0, 3),
        ],
    )
    runner.replay(feed, ddls)
    # declaring target: value withheld; other target: data intact
    assert {r.text for r in lakes["transcripts"].read().collect()} == {None}
    assert {r.text for r in lakes["users"].read().collect()} == {"real-data"}


def test_create_table_with_generated_column_registers(spark, tmp_path):
    """CREATE TABLE declaring a generated column: the data columns
    exclude it, the lake is created without it, and the name registers
    for pruning — no error-operator detour."""
    from dm_spark.schema.ddl_parser import parse_ddl

    cfg = TaskConfig(routes=[RouteRule(pattern="db.*", target="db.t9")])
    lake = LakeTable.create(spark, str(tmp_path / "seedlake"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(
        pipeline=ApplyPipeline(cfg), lake=lake, lake_root=str(tmp_path / "lakes")
    )
    (cev,) = parse_ddl(
        "CREATE TABLE db.t9 (id BIGINT PRIMARY KEY, v TEXT, "
        "v_up TEXT GENERATED ALWAYS AS (upper(v)) VIRTUAL)",
        1, 0,
    )
    runner.handle_ddl(cev)
    assert runner.registry.get("db.t9") == [("id", "bigint"), ("v", "string")]
    assert runner.dynamic_generated == {"db.t9": ["v_up"]}
    created = runner.lakes["db.t9"]
    assert [f["name"] for f in created.schema_fields()] == ["id", "v"]


def test_runner_mode_epoch_threads_into_merges(spark, tmp_path):
    """ADVICE r04 #3: CdcStreamDriver(epoch=N) must reach runner-mode
    merges — otherwise the reported checkpoint freezes after a
    re-master in exactly the (DDL-capable) mode that needs it."""
    from dm_spark.streaming import CdcStreamDriver

    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.t", target="transcripts")])
    lake = LakeTable.create(spark, str(tmp_path / "lake_ep"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=lake)
    CdcStreamDriver(
        spark, str(tmp_path / "feed"), str(tmp_path / "cp"),
        runner.pipeline, {"transcripts": lake}, runner=runner, epoch=2,
    )
    assert runner.epoch == 2  # constructor threads it
    runner.apply_dml_batch(ev(spark, [("I", "a", 1, "v1", "shard_0.t", 0, 1)]))
    assert lake.global_checkpoint()["epoch"] == 2


def test_hundred_routed_targets_merge_correctly(spark, tmp_path):
    """Many-tables scale (reference tests/many_tables runs 500+ tables;
    VERDICT r04 #2): 100 routed target lakes in one batch — the
    per-target merges fan out over the driver thread pool and every
    lake ends with exactly its rows. Pinned at 100 here; the pool keeps
    per-batch wall-time sublinear in target count (BENCH.md note)."""
    n_targets = 100
    routes = [
        RouteRule(pattern=f"db.s{i}", target=f"t{i}") for i in range(n_targets)
    ]
    cfg = TaskConfig(routes=routes)
    lakes = {
        f"t{i}": LakeTable.create(
            spark, str(tmp_path / f"lk{i}"), SCHEMA, KEY, n_buckets=2
        )
        for i in range(n_targets)
    }
    runner = ReplayRunner(pipeline=ApplyPipeline(cfg), lakes=lakes)
    feed = ev(
        spark,
        [("I", f"c{i}", 1, f"v{i}", f"db.s{i}", 0, i + 1) for i in range(n_targets)],
    )
    runner.apply_dml_batch(feed, batch_id=0)
    for i in (0, 1, 37, 64, 99):
        assert rows(lakes[f"t{i}"]) == [(f"c{i}", 1, f"v{i}")]
    # no cross-target leakage anywhere
    assert sum(lakes[f"t{i}"].read().count() for i in range(n_targets)) == n_targets


def test_replace_with_generated_column_add_registers_not_crashes(spark, runner):
    """An error-operator REPLACEMENT that is a generated-column ADD at
    a plain column-DDL location routes to the generated registration
    (pruned from images, no lake schema change) instead of hitting
    lake.apply_ddl's unknown-action error and killing the batch with
    the at-most-once op already spent (review r5)."""
    runner.barrier = None
    runner.error_ops.set_replace(
        0, 3, [{"action": "add_generated_column", "column": "gcol"}]
    )
    feed = ev(spark, [("I", "a", 1, "v1", "shard_0.t", 0, 1)])
    ddls = [DdlEvent("add_column", "shard_0.t", 0, 3, column="bad", new_type="json")]
    runner.replay(feed, ddls)
    assert any(a["action"] == "add_generated_column" for a in runner.applied_ddl)
    cols = runner.lake.read().columns
    assert "gcol" not in cols and "bad" not in cols
    assert runner.lake.read().count() == 1


def test_optimistic_replace_naming_other_table_routes_there(spark, tmp_path):
    """A `ctl binlog replace` at an optimistic-group location whose
    replacement SQL names a DIFFERENT (non-group) table must apply to
    THAT table's lake — same contract as _apply_resolved ('a
    replacement composed from SQL names its own table'). The pre-fix
    branch passed ev.source_table to the optimistic sync, joining the
    named table's column into the group's lake instead (review r5)."""
    cfg = TaskConfig(routes=[
        RouteRule(pattern="shard_*.t", target="transcripts"),
        RouteRule(pattern="other.x", target="other_t"),
    ])
    group_lake = LakeTable.create(
        spark, str(tmp_path / "lake_g"), SCHEMA, KEY, n_buckets=4
    )
    other_lake = LakeTable.create(
        spark, str(tmp_path / "lake_x"), SCHEMA, KEY, n_buckets=4
    )
    runner = ReplayRunner(
        pipeline=ApplyPipeline(cfg),
        lakes={"transcripts": group_lake, "other_t": other_lake},
        optimistic_group=["shard_0.t", "shard_1.t"],
    )
    runner.error_ops.set_replace(
        0, 3, [{
            "action": "add_column", "column": "extra", "new_type": "int",
            "source_table": "other.x",
        }]
    )
    applied = runner.handle_ddl(
        DdlEvent("add_column", "shard_0.t", 0, 3, column="bad", new_type="json")
    )
    assert [a["action"] for a in applied] == ["add_column"]
    assert "extra" in other_lake.read().columns
    assert "extra" not in group_lake.read().columns  # NOT joined into the group
    assert "bad" not in group_lake.read().columns


def test_optimistic_replace_with_generated_column_add(spark, tmp_path):
    """The same replacement hatch on an OPTIMISTIC-group table: a `ctl
    binlog replace` swapping a generated-column ADD in for a plain
    column DDL must route to the generated registration, not to
    registry.apply's unknown-action error — the optimistic branch
    previously bypassed _apply_resolved's routing (review r5)."""
    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.t", target="transcripts")])
    lake = LakeTable.create(spark, str(tmp_path / "lake_og"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(
        pipeline=ApplyPipeline(cfg), lake=lake,
        optimistic_group=["shard_0.t", "shard_1.t"],
    )
    runner.error_ops.set_replace(
        0, 3, [{"action": "add_generated_column", "column": "gcol"}]
    )
    feed = ev(spark, [("I", "a", 1, "v1", "shard_0.t", 0, 1)])
    ddls = [DdlEvent("add_column", "shard_0.t", 0, 3, column="bad", new_type="json")]
    runner.replay(feed, ddls)
    assert any(a["action"] == "add_generated_column" for a in runner.applied_ddl)
    cols = lake.read().columns
    assert "gcol" not in cols and "bad" not in cols
    assert rows(lake) == [("a", 1, "v1")]
