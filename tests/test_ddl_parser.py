"""DDL parser: MySQL ALTER/RENAME text -> atomic DdlEvents with suffix
ordinals (parseOneStmt syncer/ddl.go:33-47 + SplitDDL
syncer/syncer.go:2235-2252 analog), type mapping, and end-to-end apply
through the ReplayRunner."""

from __future__ import annotations

import pytest

from dm_spark.schema.ddl_parser import UnsupportedDdl, map_type, parse_ddl


def test_map_type():
    assert map_type("INT") == "int"
    assert map_type("int unsigned") == "bigint"  # widened for range
    assert map_type("MEDIUMINT") == "int"
    assert map_type("VARCHAR(255)") == "string"
    assert map_type("decimal(10,2)") == "decimal(10,2)"
    assert map_type("DATETIME") == "timestamp"
    with pytest.raises(UnsupportedDdl):
        map_type("geometry")


def test_parse_single_changes():
    (e,) = parse_ddl("ALTER TABLE db.t ADD COLUMN rating INT NOT NULL", 3, 7)
    assert (e.action, e.source_table, e.column, e.new_type) == (
        "add_column", "db.t", "rating", "int",
    )
    assert e.loc() == (3, 7, 0)
    (e,) = parse_ddl("alter table t rename column tool to tool_name;", 3, 8)
    assert (e.action, e.column, e.new_name) == ("rename_column", "tool", "tool_name")
    (e,) = parse_ddl("ALTER TABLE t MODIFY turn_idx BIGINT", 3, 9)
    assert (e.action, e.column, e.new_type) == ("widen_type", "turn_idx", "bigint")
    (e,) = parse_ddl("ALTER TABLE t DROP COLUMN junk", 3, 10)
    assert (e.action, e.column) == ("drop_column", "junk")
    (e,) = parse_ddl("RENAME TABLE db._t_gho TO db.t", 3, 11)
    assert (e.action, e.source_table, e.target_table) == (
        "rename_table", "db._t_gho", "db.t",
    )


def test_parse_multi_change_splits_with_suffixes():
    evs = parse_ddl(
        "ALTER TABLE t ADD a INT, ADD b DECIMAL(10,2), DROP c, "
        "CHANGE old_name new_name BIGINT",
        5, 100,
    )
    assert [(e.action, e.suffix) for e in evs] == [
        ("add_column", 0),
        ("add_column", 1),
        ("drop_column", 2),
        ("rename_column", 3),  # CHANGE = rename + retype
        ("widen_type", 4),
    ]
    assert all(e.loc()[:2] == (5, 100) for e in evs)
    assert evs[1].new_type == "decimal(10,2)"  # comma inside parens kept


def test_parse_unsupported_raises():
    with pytest.raises(UnsupportedDdl):
        parse_ddl("CREATE INDEX i ON t (a)", 0, 0)
    with pytest.raises(UnsupportedDdl):
        parse_ddl("ALTER TABLE t ADD FULLTEXT KEY ft (text)", 0, 0)


def test_parsed_ddl_applies_through_runner(spark, tmp_path):
    from dm_spark.config import RouteRule, TaskConfig
    from dm_spark.lake import LakeTable
    from dm_spark.operators import ApplyPipeline
    from dm_spark.plans import ReplayRunner

    from tests.test_replay_runner import KEY, SCHEMA, ev

    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.t", target="transcripts")])
    lake = LakeTable.create(spark, str(tmp_path / "lake"), SCHEMA, KEY, n_buckets=4)
    runner = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=lake)
    feed = ev(spark, [("I", "a", 1, "v1", "shard_0.t", 0, 1)])
    ddls = parse_ddl(
        "ALTER TABLE shard_0.t ADD rating INT, RENAME COLUMN tool TO tool_name",
        0, 5,
    )
    runner.replay(feed, ddls)
    cols = {f["name"] for f in lake.schema_fields()}
    assert "rating" in cols and "tool_name" in cols and "tool" not in cols


def test_change_same_name_is_pure_widen():
    """MySQL's idiomatic retype `CHANGE c c BIGINT` (old == new) must
    emit ONLY the widen event — a self-rename would trip the
    key-column rename guard on key widenings (ADVICE r02)."""
    evs = parse_ddl("ALTER TABLE db.t CHANGE turn_idx turn_idx BIGINT", 0, 7)
    assert [(e.action, e.column, e.new_type) for e in evs] == [
        ("widen_type", "turn_idx", "bigint")
    ]


def test_change_key_retype_applies(spark, tmp_path):
    """End-to-end: an in-class key widening expressed via CHANGE must
    succeed exactly like the equivalent MODIFY (ADVICE r02)."""
    from dm_spark.lake import LakeTable

    from tests.test_replay_runner import KEY, SCHEMA

    lake = LakeTable.create(spark, str(tmp_path / "lake_ck"), SCHEMA, KEY, n_buckets=4)
    evs = parse_ddl("ALTER TABLE shard_0.t CHANGE turn_idx turn_idx BIGINT", 1, 0)
    for e in evs:
        assert lake.apply_ddl(e.to_action())
    types = {f["name"]: f["type"] for f in lake.schema_fields()}
    assert types["turn_idx"] == "bigint"


def test_parse_create_table():
    evs = parse_ddl(
        "CREATE TABLE IF NOT EXISTS db.t ("
        " id BIGINT NOT NULL,"
        " conv VARCHAR(64),"
        " amount DECIMAL(10,2) DEFAULT 0,"
        " uk_code VARCHAR(32) UNIQUE,"
        " PRIMARY KEY (id),"
        " UNIQUE KEY uq_conv (conv, amount),"
        " KEY idx_c (conv)"
        ") ENGINE=InnoDB DEFAULT CHARSET=utf8mb4",
        3, 7,
    )
    assert len(evs) == 1
    e = evs[0]
    assert e.action == "create_table" and e.source_table == "db.t"
    assert e.columns == [
        ("id", "bigint"), ("conv", "string"), ("amount", "decimal(10,2)"),
        ("uk_code", "string"),
    ]
    assert e.key == ["id"]
    assert e.unique_keys == [["uk_code"], ["conv", "amount"]]


def test_parse_create_inline_pk():
    e = parse_ddl("CREATE TABLE t (id INT PRIMARY KEY, v TEXT)", 0, 0)[0]
    assert e.key == ["id"] and e.columns == [("id", "int"), ("v", "string")]


def test_parse_drop_truncate():
    d = parse_ddl("DROP TABLE IF EXISTS db.t", 0, 1)[0]
    assert (d.action, d.source_table) == ("drop_table", "db.t")
    t = parse_ddl("TRUNCATE TABLE db.t", 0, 2)[0]
    assert (t.action, t.source_table) == ("truncate_table", "db.t")
    t2 = parse_ddl("truncate db.t", 0, 3)[0]
    assert t2.action == "truncate_table"


def test_parse_create_foreign_key_unsupported():
    import pytest

    with pytest.raises(UnsupportedDdl):
        parse_ddl(
            "CREATE TABLE t (id INT, FOREIGN KEY (id) REFERENCES p(id))", 0, 0
        )
