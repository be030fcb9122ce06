"""Schema tracker + optimistic shard-DDL reconciliation.

The reference tracks the *upstream* schema per table by replaying DDL
into an embedded TiDB (pkg/schema/tracker.go:55-163) and, in optimistic
shard mode, the master JOINS all shards' schemas into the maximal
compatible schema and diffs joined-old vs joined-new to derive the real
downstream DDL (pkg/shardddl/optimism/lock.go:43-380 `TrySync`,
docs/RFCS/20191209_optimistic_ddl.md).

Spark-native re-expression:
- a table schema is an ordered list of (name, type) with per-shard
  versions held in a registry dict;
- `join_schemas` = field-wise union with widest-type promotion
  (`unionByName(allowMissingColumns=True)` semantics);
- `reconcile_actions` diffs the joined schema against the lake table's
  catalog schema and emits the add/widen actions to apply
  (`LakeTable.apply_ddl`). Renames are explicit actions (never inferred
  from a diff — same as the reference, which forbids ambiguous rename
  inference in optimistic mode).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# widening lattice (MySQL-ish numeric tower mapped to Spark types)
_WIDEN_ORDER = ["boolean", "tinyint", "smallint", "int", "bigint", "float", "double"]
_STRINGY = {"string", "varchar", "char"}


def _decimal_ps(t: str) -> tuple[int, int] | None:
    m = re.fullmatch(r"decimal(?:\((\d+)\s*,\s*(\d+)\))?", t)
    if not m:
        return None
    return (int(m.group(1) or 10), int(m.group(2) or 0))


def _decimal_or_conflict(p: int, s: int, a: str, b: str) -> str:
    """A joined decimal wider than Spark's max precision (38) cannot
    hold both sides exactly — any clamp would silently truncate one
    side's stored digits, so surface it as the same incompatible-type
    conflict unrepresentable joins already raise (e.g. decimal(38,20)
    vs decimal(38,0) needs decimal(58,20))."""
    if p > 38:
        raise ValueError(
            f"incompatible types for join: {a} vs {b} "
            f"(joined decimal({p},{s}) exceeds Spark's max precision 38)"
        )
    return f"decimal({p},{s})"


def widest(a: str, b: str) -> str:
    a, b = a.lower(), b.lower()
    if a == b:
        return a
    if a in _STRINGY or b in _STRINGY:
        return "string"
    if a in _WIDEN_ORDER and b in _WIDEN_ORDER:
        return _WIDEN_ORDER[max(_WIDEN_ORDER.index(a), _WIDEN_ORDER.index(b))]
    da, db = _decimal_ps(a), _decimal_ps(b)
    if da or db:
        # parametrized decimals — what ddl_parser emits for DECIMAL(p,s)
        # and BIGINT UNSIGNED (decimal(20,0)); join pairwise with ints
        # (exact superset by precision) and floats (-> double)
        other = b if da else a
        if da and db:
            s = max(da[1], db[1])
            return _decimal_or_conflict(max(da[0] - da[1], db[0] - db[1]) + s, s, a, b)
        d = da or db
        if other in _WIDEN_ORDER:
            if other in ("float", "double"):
                return "double"
            # bigint needs 20 integer digits to hold unsigned ranges
            p = max(d[0] - d[1], 20) + d[1]
            return _decimal_or_conflict(p, d[1], a, b)
    if {a, b} <= {"timestamp", "timestamp_ntz", "date"}:
        return "timestamp"
    # incompatible (e.g. array vs int): surface as conflict
    raise ValueError(f"incompatible types for join: {a} vs {b}")


def join_schemas(schemas: list[list[tuple[str, str]]]) -> list[tuple[str, str]]:
    """Maximal compatible schema over shard schemas: superset of columns
    (first-seen order), widest type per column — `schemacmp.Table.Join`
    analog (pkg/shardddl/optimism/lock.go:115)."""
    order: list[str] = []
    types: dict[str, str] = {}
    for sch in schemas:
        for name, typ in sch:
            if name not in types:
                order.append(name)
                types[name] = typ
            else:
                types[name] = widest(types[name], typ)
    return [(n, types[n]) for n in order]


def reconcile_actions(
    current: list[tuple[str, str]], joined: list[tuple[str, str]]
) -> list[dict]:
    """ALTER actions that evolve `current` (the lake/catalog schema) to
    cover `joined`. Additive-only: add_column for new fields, widen_type
    where the joined type is wider. Drops are never inferred (a shard
    lagging behind must still be writable — optimistic-mode invariant).
    """
    cur = dict(current)
    actions = []
    for name, typ in joined:
        if name not in cur:
            actions.append({"action": "add_column", "column": name, "new_type": typ})
        elif cur[name].lower() != typ.lower():
            if widest(cur[name], typ) != cur[name].lower():
                actions.append({"action": "widen_type", "column": name, "new_type": typ})
    return actions


@dataclass
class SchemaRegistry:
    """Per (shard) source-table schema versions, keyed by source table
    name — the tracker's in-memory state, seeded from the target table
    (the reference seeds from downstream `SHOW CREATE TABLE`,
    syncer/syncer.go:719-784) and mutated by DDL actions."""

    schemas: dict[str, list[tuple[str, str]]] = field(default_factory=dict)

    def seed(self, table: str, schema: list[tuple[str, str]]) -> None:
        self.schemas.setdefault(table, list(schema))

    def get(self, table: str) -> list[tuple[str, str]]:
        return self.schemas[table]

    def apply(self, table: str, action: dict) -> None:
        sch = list(self.schemas[table])
        kind = action["action"]
        if kind == "add_column":
            if action["column"] not in dict(sch):
                sch.append((action["column"], action["new_type"]))
        elif kind == "rename_column":
            sch = [
                (action["new_name"] if n == action["column"] else n, t) for n, t in sch
            ]
        elif kind == "widen_type":
            sch = [
                (n, action["new_type"] if n == action["column"] else t) for n, t in sch
            ]
        elif kind == "drop_column":
            sch = [(n, t) for n, t in sch if n != action["column"]]
        else:
            raise ValueError(f"unknown ddl action {kind}")
        self.schemas[table] = sch

    def joined(self, tables: list[str]) -> list[tuple[str, str]]:
        return join_schemas([self.schemas[t] for t in tables if t in self.schemas])
