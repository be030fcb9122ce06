"""Error operators: user-supplied skip/replace overrides by location.

The reference lets an operator skip a failing DDL or inject replacement
SQL at a binlog position (`handle-error`, syncer/handle_error.go:32-73;
match/apply syncer/err-operator/operator.go:60-173; injected events get
an artificial location Suffix so ordering stays total,
pkg/binlog/position.go Suffix). Here: an override table keyed by
(file_seq, pos) consulted before a schema action is applied."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ErrorOperators:
    # (file_seq, pos) -> {"kind": "skip"} | {"kind": "replace", "actions": [...]}
    ops: dict[tuple[int, int], dict] = field(default_factory=dict)

    def set_skip(self, file_seq: int, pos: int) -> None:
        self.ops[(file_seq, pos)] = {"kind": "skip"}

    def set_replace(self, file_seq: int, pos: int, actions: list[dict]) -> None:
        self.ops[(file_seq, pos)] = {"kind": "replace", "actions": list(actions)}

    def revert(self, file_seq: int, pos: int) -> bool:
        return self.ops.pop((file_seq, pos), None) is not None

    def resolve(self, action: dict) -> list[dict]:
        """Map one incoming schema action to the list to actually apply:
        [] (skipped), [action] (untouched), or the replacements, each
        stamped with the original (file_seq, pos) plus a `suffix`
        ordinal — the reference's Location.Suffix
        (pkg/binlog/position.go:229-235, :298-317). pos itself is never
        mutated, so genuine later events in the same file keep their
        place in the total order."""
        loc = (action.get("file_seq", 0), action.get("pos", 0))
        ov = self.ops.get(loc)
        if ov is None:
            return [action]
        if ov["kind"] == "skip":
            return []
        out = []
        for i, rep in enumerate(ov["actions"]):
            r = dict(rep)
            r.setdefault("file_seq", loc[0])
            r.setdefault("pos", loc[1])
            r.setdefault("suffix", i + 1)
            out.append(r)
        return out
