"""Misc operator tests: generated-column pruning, property-based LWW
invariance (hypothesis — the go-sqlsmith randomized-workload analog)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dm_spark.lake import LakeTable
from dm_spark.operators.mapping import prune_generated_columns

from tests.test_lake import CHANGE_DDL, SCHEMA, KEY, T, ch, rows


def test_prune_generated_columns(spark):
    df = spark.createDataFrame(
        [("I", ("a", 1, "x"), ("a", 1, "x"))],
        "op string, before struct<conv_id string, turn_idx int, gen string>, "
        "after struct<conv_id string, turn_idx int, gen string>",
    )
    out = prune_generated_columns(df, ["gen"])
    assert out.schema["after"].dataType.fieldNames() == ["conv_id", "turn_idx"]
    assert out.schema["before"].dataType.fieldNames() == ["conv_id", "turn_idx"]
    r = out.collect()[0]
    assert r.after.conv_id == "a" and r.before.turn_idx == 1


# --- property: final table state is invariant under how the same event
# sequence is split into batches (the quiescent-consistency guarantee
# the reference gets from causality + per-queue ordering).

_ops = st.sampled_from(["I", "U", "D"])
_keys = st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(1, 3))


@settings(max_examples=8, deadline=None)
@given(
    events=st.lists(st.tuples(_ops, _keys), min_size=1, max_size=12),
    split=st.integers(0, 11),
)
def test_lww_batch_split_invariance(spark, tmp_path_factory, events, split):
    data = [
        ch(k[0], k[1], op, f"v{i}" if op != "D" else None, 0, i + 1, i + 1)
        for i, (op, k) in enumerate(events)
    ]
    df = spark.createDataFrame(data, CHANGE_DDL)

    base = tmp_path_factory.mktemp("lww")
    one = LakeTable.create(spark, str(base / "one"), SCHEMA, KEY, n_buckets=4)
    one.merge_into(df)

    two = LakeTable.create(spark, str(base / "two"), SCHEMA, KEY, n_buckets=4)
    cut = min(split, len(data)) or 1
    two.merge_into(df.where(F.col("_cdc_pos") <= cut), batch_id=0)
    two.merge_into(df.where(F.col("_cdc_pos") > cut), batch_id=1)

    assert rows(one.read()) == rows(two.read())


def test_unsigned_reinterpret(spark):
    """castUnsigned analog (syncer/dml.go:185-212): negative
    signed-decoded values wrap by +2^bits; MEDIUMINT uses 24 bits."""
    from dm_spark.operators.mapping import unsigned_reinterpret

    df = spark.createDataFrame(
        [("U", (-1, -1, 5), (-2, 8388607, 5))],
        "op string, before struct<a int, m int, ok int>, "
        "after struct<a int, m int, ok int>",
    )
    out = unsigned_reinterpret(df, {"a": 32, "m": 24}).collect()[0]
    assert out.before.a == 4294967295 and out.after.a == 4294967294
    assert out.before.m == 16777215 and out.after.m == 8388607  # positive: unchanged
    assert out.before.ok == 5  # unmapped column untouched


def test_unsigned_reinterpret_null_image(spark):
    from dm_spark.operators.mapping import unsigned_reinterpret

    df = spark.createDataFrame(
        [("I", None, (-1, 0, 1))],
        "op string, before struct<a int, m int, ok int>, "
        "after struct<a int, m int, ok int>",
    )
    out = unsigned_reinterpret(df, {"a": 16}).collect()[0]
    assert out.before is None and out.after.a == 65535


# --- property: flatten_changes + single LWW merge must equal a
# SEQUENTIAL replay (apply events one at a time in order), including
# key-moving updates — the semantics the reference guarantees via
# ordered per-key apply (syncer/dml.go:90-152 delete+insert rewrite).

_km_events = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "UM", "D"]),  # UM = key-moving update
        _keys,
        st.integers(1, 3),  # UM's destination turn_idx
    ),
    min_size=1,
    max_size=14,
)


@settings(max_examples=8, deadline=None)
@given(events=_km_events)
def test_key_move_sequential_equivalence(spark, tmp_path_factory, events):
    import datetime as _dt

    from dm_spark.feed import ENVELOPE_DDL
    from dm_spark.operators import flatten_changes

    def img(conv, turn, text, i):
        return (conv, turn, "user", text, None, T(i))

    rows_in, state = [], {}
    for i, (op, (conv, turn), dest) in enumerate(events):
        text = f"v{i}"
        if op == "I" or (op in ("U", "UM") and (conv, turn) not in state):
            # inserts (and updates to absent keys act as upserts)
            rows_in.append(("I", None, img(conv, turn, text, i), "s.t", 0, i + 1, T(i + 1), 0))
            state[(conv, turn)] = text
        elif op == "U":
            rows_in.append(
                ("U", img(conv, turn, state[(conv, turn)], i), img(conv, turn, text, i),
                 "s.t", 0, i + 1, T(i + 1), 0)
            )
            state[(conv, turn)] = text
        elif op == "UM":
            rows_in.append(
                ("U", img(conv, turn, state[(conv, turn)], i), img(conv, dest, text, i),
                 "s.t", 0, i + 1, T(i + 1), 0)
            )
            del state[(conv, turn)]
            state[(conv, dest)] = text
        else:  # D
            if (conv, turn) not in state:
                continue  # deleting an absent key: no event emitted
            rows_in.append(
                ("D", img(conv, turn, state[(conv, turn)], i), None,
                 "s.t", 0, i + 1, T(i + 1), 0)
            )
            del state[(conv, turn)]
    if not rows_in:
        return
    env = spark.createDataFrame(rows_in, ENVELOPE_DDL)
    flat = flatten_changes(env)
    lake = LakeTable.create(
        spark, str(tmp_path_factory.mktemp("km") / "t"), SCHEMA, KEY, n_buckets=4
    )
    lake.merge_into(flat, batch_id=0)
    got = {(r.conv_id, r.turn_idx): r.text for r in lake.read().collect()}
    assert got == state


def test_identity_key_fallback_ladder(spark):
    """findFitIndex ladder (syncer/dml.go:260-318): PK when its columns
    are non-null in the row image, else first fully-non-null UK, else
    every column."""
    from dm_spark.operators.identity import identity_key

    ddl = (
        "op string, before struct<a string, b int, u string>, "
        "after struct<a string, b int, u string>"
    )
    df = spark.createDataFrame(
        [
            ("I", None, ("x", 1, "uu")),          # pk usable
            ("I", None, (None, 1, "uu")),          # pk null -> uk
            ("I", None, (None, None, None)),       # nothing -> full row
            ("D", ("y", 2, "vv"), None),           # delete uses before image
        ],
        ddl,
    )
    out = identity_key(df, pk=["a", "b"], unique_keys=[["u"]]).collect()
    kinds = [r.identity_kind for r in out]
    assert kinds == ["pk", "uk0", "full_row", "pk"]
    keys = [r.identity_key for r in out]
    assert len(set(keys)) == 4 and keys[0].startswith("pk\x1fa=x")
    # distribution-ready: repartition on the computed key is valid SQL
    n = (
        identity_key(df, ["a", "b"], [["u"]])
        .repartition(4, "identity_key")
        .count()
    )
    assert n == 4


def test_expression_filter_null_keeps_row(spark):
    """Skip ONLY when the expression is TRUE (syncer/expr_filter_
    group.go): a NULL-evaluating expression (nullable column in a
    comparison) must KEEP the row — three-valued ~(NULL) used to drop
    it silently."""
    from dm_spark.config import ExprFilterRule
    from dm_spark.operators.filters import expression_filter

    df = spark.createDataFrame(
        [("I", "c1", "tool", None), ("I", "c2", "tool", "debug"), ("I", "c3", "user", None)],
        "op string, conv_id string, role string, tool string",
    ).selectExpr("op", "named_struct('conv_id', conv_id, 'role', role, 'tool', tool) AS after",
                 "'s.t' AS source_table")
    out = expression_filter(
        df, [ExprFilterRule(pattern="s.t", insert_expr="after.role = 'tool' AND after.tool = 'debug'")]
    )
    got = {r["after"]["conv_id"] for r in out.collect()}
    assert got == {"c1", "c3"}  # c2 skipped (TRUE); c1 kept (NULL), c3 kept (FALSE)


def test_identity_empty_rung_not_vacuously_usable(spark):
    """unique_keys=[[]] (config plumbing artifact) must not collapse
    every row onto one constant identity — empty rungs are skipped and
    the ladder falls through to full_row."""
    from dm_spark.operators.identity import identity_key

    df = spark.createDataFrame(
        [("I", "a", 1), ("I", "b", 2)],
        "op string, k string, v int",
    ).selectExpr("op", "named_struct('k', k, 'v', v) AS after",
                 "CAST(NULL AS STRUCT<k:string,v:int>) AS before")
    out = identity_key(df, pk=[], unique_keys=[[]]).collect()
    kinds = {r["identity_kind"] for r in out}
    keys = {r["identity_key"] for r in out}
    assert kinds == {"full_row"} and len(keys) == 2


def test_widest_handles_parametrized_decimals(spark):
    """BIGINT UNSIGNED maps to decimal(20,0); joining it with bigint
    (a lagging shard) must widen, not crash optimistic reconciliation."""
    from dm_spark.schema.registry import join_schemas, reconcile_actions, widest

    assert widest("bigint", "decimal(20,0)") == "decimal(20,0)"
    assert widest("decimal(10,2)", "decimal(20,0)") == "decimal(22,2)"
    assert widest("decimal(20,0)", "double") == "double"
    joined = join_schemas([[("c", "bigint")], [("c", "decimal(20,0)")]])
    assert joined == [("c", "decimal(20,0)")]
    acts = reconcile_actions([("c", "bigint")], joined)
    assert acts == [{"action": "widen_type", "column": "c", "new_type": "decimal(20,0)"}]


def test_widest_decimal_over_max_precision_is_a_conflict(spark):
    """A joined decimal past Spark's precision cap (38) cannot hold both
    sides exactly — it must surface as the incompatible-type conflict,
    not an invalid type string that crashes downstream (ADVICE r03 #5)."""
    from dm_spark.schema.registry import widest

    with pytest.raises(ValueError, match="max precision 38"):
        widest("decimal(38,20)", "decimal(38,0)")  # needs decimal(58,20)
    with pytest.raises(ValueError, match="max precision 38"):
        widest("decimal(38,20)", "bigint")  # needs decimal(40,20)
    # at the cap exactly is still fine
    assert widest("decimal(38,18)", "bigint") == "decimal(38,18)"
    assert widest("decimal(30,2)", "decimal(10,8)") == "decimal(36,8)"


def test_table_diff_key_only_table(spark):
    """A pure link table (every shared column is a key) must diff by
    presence instead of crashing on a zero-arg hash."""
    from dm_spark.validator import table_diff

    l = spark.createDataFrame([("a",), ("b",)], "k string")
    r = spark.createDataFrame([("a",), ("c",)], "k string")
    d = table_diff(l, r, key=["k"])
    assert d["missing_right"] == 1 and d["missing_left"] == 1 and d["mismatched"] == 0


def test_multi_table_rename_parses_to_ordered_pairs(spark):
    """gh-ost's real atomic cut-over is one statement; it must yield
    two rename events in order, suffix-separated."""
    from dm_spark.schema import parse_ddl

    evs = parse_ddl("RENAME TABLE db.t TO db._t_del, db._t_gho TO db.t", 0, 7)
    assert [(e.source_table, e.target_table, e.suffix) for e in evs] == [
        ("db.t", "db._t_del", 0), ("db._t_gho", "db.t", 1),
    ]


def test_frame_sample_no_phantom_frame(spark):
    """Media whose length is an exact stride multiple must not emit a
    zero-length frame past the end (ceil, not n//stride+1)."""
    from dm_spark.functions.multimodal import frame_sample

    df = spark.createDataFrame(
        [(1, bytearray(b"x" * 128)), (2, bytearray(b"y" * 100))],
        "doc_id long, media binary",
    )
    got = frame_sample(df, stride=64).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append((r.frame_idx, r.frame_off, r.frame_len))
    assert sorted(by_doc[1]) == [(0, 0, 64), (1, 64, 64)]  # no (2,128,0)
    assert sorted(by_doc[2]) == [(0, 0, 64), (1, 64, 36)]


def test_pattern_matching_case_insensitive_by_default(spark):
    """The reference builds every matching surface (ba-list, event
    filter, router, column mapping) with cfg.CaseSensitive
    (syncer/syncer.go:323-336), default FALSE (source_config.go:94) —
    mirroring MySQL's usual lower_case_table_names. A mixed-case
    upstream name must match lowercase patterns by default;
    TaskConfig(case_sensitive=True) opts into exact matching."""
    from dm_spark.config import RouteRule, TaskConfig
    from dm_spark.operators.filters import ba_list_filter
    from dm_spark.operators.router import route_tables

    df = spark.createDataFrame(
        [("Shard_0.Transcripts_A", 1), ("other.t", 2)],
        "source_table string, x int",
    )
    # default: insensitive — the mixed-case table passes the allow list
    # and routes
    kept = ba_list_filter(df, allow=["shard_*.transcripts_*"]).collect()
    assert [r.x for r in kept] == [1]
    routed = route_tables(
        df, [RouteRule(pattern="shard_*.transcripts_*", target="transcripts")],
    ).collect()
    assert {(r.x, r.target_table) for r in routed} == {
        (1, "transcripts"), (2, "other.t"),
    }
    # opt-in exact matching: the mixed-case name no longer matches
    kept = ba_list_filter(
        df, allow=["shard_*.transcripts_*"], case_sensitive=True
    ).collect()
    assert kept == []
    # driver-side twin agrees with the executor-side router
    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.transcripts_*", target="transcripts")])
    assert cfg.route_of("Shard_0.Transcripts_A") == "transcripts"
    cfg.case_sensitive = True
    assert cfg.route_of("Shard_0.Transcripts_A") == "Shard_0.Transcripts_A"


def test_pii_scrub_rule_scrubs_both_images_by_table_pattern(spark):
    from dm_spark.operators.mapping import apply_column_mappings, pii_scrub_rule

    df = spark.createDataFrame(
        [
            ("U", ("a", 1, "old bob@x.io"), ("a", 1, "mail jo@x.io or 1.2.3.4"),
             "shard_0.t"),
            ("U", ("b", 1, "keep ann@x.io"), ("b", 1, "call +1 555 0100 99"),
             "other.t"),
            ("I", None, ("c", 1, "ref #12345 ok"), "shard_1.t"),
        ],
        "op string, before struct<conv_id string, turn_idx int, text string>, "
        "after struct<conv_id string, turn_idx int, text string>, "
        "source_table string",
    )
    rule = pii_scrub_rule("shard_*.t", "text", extra=[("#[0-9]+", "<ID>")])
    out = {r.source_table: r for r in apply_column_mappings(df, [rule]).collect()}
    # matching table: BOTH images scrubbed (tombstones/splits carry
    # scrubbed payloads too)
    assert out["shard_0.t"].before.text == "old <EMAIL>"
    assert out["shard_0.t"].after.text == "mail <EMAIL> or <IP>"
    # non-matching table untouched
    assert out["other.t"].before.text == "keep ann@x.io"
    assert out["other.t"].after.text == "call +1 555 0100 99"
    # null image stays null; extra rule applies after the classes
    assert out["shard_1.t"].before is None
    assert out["shard_1.t"].after.text == "ref <ID> ok"


def test_pii_scrub_rule_rejects_unknown_class(spark):
    import pytest as _pytest

    from dm_spark.operators.mapping import pii_scrub_rule

    with _pytest.raises(ValueError, match="unknown classes"):
        pii_scrub_rule("shard_*.t", "text", classes=("email", "ssn"))
