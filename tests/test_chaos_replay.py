"""Randomized DML+DDL replay through ReplayRunner diffed against a
pure-pandas sequential oracle — the chaos-suite analog (the reference
generates random workloads with go-sqlsmith and diffs upstream vs
downstream, chaos/cases/generator.go:12, chaos/cases/diff.go). The
existing hypothesis properties pin the MERGE kernel; this pins the
whole runner: flush-before-DDL splits, rename_map routing of
pre-rename images, dropped-column pruning, LWW across the interleaving."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from dm_spark.config import RouteRule, TaskConfig
from dm_spark.feed import ENVELOPE_DDL
from dm_spark.lake import LakeTable
from dm_spark.operators import ApplyPipeline
from dm_spark.plans import DdlEvent, ReplayRunner

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


_ops = st.sampled_from(["I", "U", "D"])
_keys = st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(1, 3))

# column-op menu: at most one op per column so the sequence is always
# valid DDL (no rename of an already-dropped column); locations are
# chosen among the ODD positions (DMLs sit at even ones) so a DDL
# never shares a location with a DML
_tool_ddl = st.sampled_from([
    None,
    ("rename_column", "tool", "tool_x"),
    ("drop_column", "tool", None),
])
_role_ddl = st.sampled_from([
    None,
    ("rename_column", "role", "who"),
    ("drop_column", "role", None),
])
_add_ddl = st.sampled_from([None, ("add_column", "rating", "int")])


@settings(max_examples=6, deadline=None)
@given(
    events=st.lists(st.tuples(_ops, _keys), min_size=1, max_size=16),
    tool_op=_tool_ddl,
    role_op=_role_ddl,
    add_op=_add_ddl,
    locs=st.tuples(st.integers(0, 15), st.integers(0, 15), st.integers(0, 15)),
)
def test_random_dml_ddl_interleaving_matches_oracle(
    spark, tmp_path_factory, events, tool_op, role_op, add_op, locs
):
    # ---- build the feed: event i sits at (0, 2i+2), ts strictly
    # increasing, every image fully populated so renames/drops are
    # value-visible
    data = []
    for i, (op, (conv, turn)) in enumerate(events):
        img = (conv, turn, f"r{i % 3}", f"v{i}", f"t{i}", T(i + 1))
        data.append((
            op,
            img if op != "I" else None,
            img if op != "D" else None,
            "shard_0.t",
            0,
            2 * i + 2,
            T(i + 1),
            i,
        ))
    feed = spark.createDataFrame(data, ENVELOPE_DDL)

    # two generated DDLs may collide on the same odd position — the
    # engine contract (parse_ddl split ordinals) is that same-location
    # DDLs carry distinct suffix ordinals; identical (file_seq, pos,
    # suffix) triples are indistinguishable from redelivery and are
    # idempotently dropped by the high-water gate, so the generator
    # must stamp suffixes exactly like the parser would
    ddls = []
    for j, (ddl, loc) in enumerate(zip((tool_op, role_op, add_op), locs)):
        if ddl is None:
            continue
        kind, col, extra = ddl
        ddls.append(DdlEvent(
            kind, "shard_0.t", 0, 2 * loc + 1, suffix=j,
            column=col,
            new_name=extra if kind == "rename_column" else None,
            new_type=extra if kind == "add_column" else None,
        ))

    base = tmp_path_factory.mktemp("chaos")
    lake = LakeTable.create(spark, str(base / "lake"), SCHEMA, KEY, n_buckets=4)
    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.t", target="transcripts")])
    runner = ReplayRunner(pipeline=ApplyPipeline(cfg), lake=lake)
    runner.replay(feed, ddls)

    # ---- pandas oracle: sequential apply (each event's location is
    # unique and ts increases, so sequential == LWW), then the column
    # ops in location order (value-wise they are whole-column edits:
    # add = null column, rename = relabel, drop = remove)
    state: dict = {}
    for i, (op, (conv, turn)) in enumerate(events):
        k = (conv, turn)
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = {
                "conv_id": conv, "turn_idx": turn, "role": f"r{i % 3}",
                "text": f"v{i}", "tool": f"t{i}", "ts": T(i + 1),
            }
    want = pd.DataFrame(
        sorted(state.values(), key=lambda r: (r["conv_id"], r["turn_idx"])),
        columns=[c for c, _t in SCHEMA],
    )
    for ev in sorted(ddls, key=lambda e: e.loc()):
        if ev.action == "add_column":
            want[ev.column] = pd.Series([None] * len(want), dtype="object")
        elif ev.action == "rename_column":
            want = want.rename(columns={ev.column: ev.new_name})
        else:  # drop_column
            want = want.drop(columns=[ev.column])

    got = (
        lake.read()
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    for c in want.columns:
        g, w = got[c], want[c].reset_index(drop=True)
        if c == "ts":
            assert (g.astype("datetime64[us]") == w.astype("datetime64[us]")).all()
        elif c == "turn_idx":
            assert (g.astype("int64") == w.astype("int64")).all()
        else:
            assert (g.fillna("~") == w.fillna("~").astype(object)).all(), c
