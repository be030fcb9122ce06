"""Wire-format event decode — the go-mysql row-image decode analog.

The reference receives binlog row images as packed bytes and decodes
them with go-mysql into Go scalars (syncer/syncer.go:1953,
`ev.Rows [][]interface{}`; type fixups syncer/dml.go:185-212). Here the
wire shape is one JSON payload per change event; decode runs as an
Arrow-batched pandas UDF (mandated: vectorized Python only, no per-row
UDFs) inside `mapInPandas`, emitting the typed change envelope.

`to_wire` is the inverse (JVM-side `to_json`) used by tests/bench to
synthesize wire feeds.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dm_spark.feed import PAYLOAD_DDL, PAYLOAD_FIELDS

WIRE_DDL = (
    "op string, payload string, source_table string, "
    "file_seq bigint, pos bigint, ts_us bigint, txn_id bigint"
)


def to_wire(envelope: DataFrame) -> DataFrame:
    """Envelope -> wire rows (payload = JSON of {before, after})."""
    return envelope.select(
        "op",
        F.to_json(
            F.struct(
                F.col("before"),
                F.col("after"),
            ),
            {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"},
        ).alias("payload"),
        "source_table",
        "file_seq",
        "pos",
        F.unix_micros("ts").alias("ts_us"),
        "txn_id",
    )


# flat kernel output: per-image columns + a null marker per image (a
# missing image must decode to a NULL struct, not a struct of nulls —
# flatten_changes and the oracles distinguish them). Image timestamps
# stay ISO STRINGS here and parse JVM-side in codegen.
_FLAT_FIELDS = [("conv_id", "string"), ("turn_idx", "int"), ("role", "string"),
                ("text", "string"), ("tool", "string")]
_FLAT_DDL = (
    "op string, b_null boolean, a_null boolean, "
    + ", ".join(f"b_{n} {t}" for n, t in _FLAT_FIELDS) + ", b_ts string, "
    + ", ".join(f"a_{n} {t}" for n, t in _FLAT_FIELDS) + ", a_ts string, "
    "source_table string, file_seq bigint, pos bigint, ts_us bigint, txn_id bigint"
)
_WIRE_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def decode_wire(wire: DataFrame) -> DataFrame:
    """Wire rows -> typed envelope via Arrow-batched pandas decode.

    Batch shape: pandas DataFrame in, pandas DataFrame out; one
    json.loads per event inside the batch loop (the same cost profile
    as go-mysql's per-event decode). Everything AROUND the loads is
    vectorized: images decode to FLAT Arrow columns (plain per-field
    lists — no per-row dict/struct building, which profiled at ~2x the
    loads themselves) and re-assemble into structs JVM-side inside
    whole-stage codegen; image timestamps pass through as strings and
    parse with `to_timestamp` (per-row pandas Timestamp parsing was
    ~65% of the old kernel), so the Python worker does exactly the
    irreducible JSON work and Arrow moves primitive columns."""
    img_fields = [n for n, _ in _FLAT_FIELDS]

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            b_null, a_null = [False] * n, [False] * n
            cols: dict[str, list] = {
                f"{side}_{f}": [None] * n
                for side in ("b", "a")
                for f in (*img_fields, "ts")
            }
            for i, p in enumerate(pdf["payload"]):
                d = json.loads(p)
                b, a = d.get("before"), d.get("after")
                if b is None:
                    b_null[i] = True
                else:
                    for f in img_fields:
                        cols[f"b_{f}"][i] = b.get(f)
                    cols["b_ts"][i] = b.get("ts")
                if a is None:
                    a_null[i] = True
                else:
                    for f in img_fields:
                        cols[f"a_{f}"][i] = a.get(f)
                    cols["a_ts"][i] = a.get("ts")
            out = {"op": pdf["op"], "b_null": b_null, "a_null": a_null}
            out.update(cols)
            for c in ("source_table", "file_seq", "pos", "ts_us", "txn_id"):
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    _ = PAYLOAD_FIELDS  # documents the struct field contract
    flat = wire.mapInPandas(kernel, schema=_FLAT_DDL)

    def image(side: str):
        fields = [F.col(f"{side}_{n}").alias(n) for n in img_fields]
        raw = F.col(f"{side}_ts")
        # strict wire format first, then Spark's lenient ISO parser
        # (covers second-precision / 'Z' / space-separated producers the
        # old per-row pd.Timestamp accepted); a present-but-unparseable
        # ts RAISES instead of silently becoming NULL — image ts is the
        # first LWW ordering component, a silent NULL would corrupt
        # conflict resolution with no signal
        parsed = F.coalesce(
            F.try_to_timestamp(raw, F.lit(_WIRE_TS_FMT)),
            F.try_to_timestamp(raw),
            F.raise_error(
                F.concat(F.lit("unparseable wire image timestamp: "), raw)
            ).cast("timestamp"),
        )
        ts = F.when(raw.isNotNull(), parsed).alias("ts")
        return F.when(~F.col(f"{side}_null"), F.struct(*fields, ts))

    return flat.select(
        "op",
        image("b").alias("before"),
        image("a").alias("after"),
        "source_table",
        "file_seq",
        "pos",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "txn_id",
    )


def decode_wire_jvm(wire: DataFrame) -> DataFrame:
    """Known-schema wire decode entirely JVM-side: `from_json` parses
    the payload into typed image structs inside whole-stage codegen — no
    Python workers at all. This is the fast path when the wire schema is
    static (it is here: the envelope is fixed by the task config); the
    Arrow-pandas `decode_wire` remains the exhibit for arbitrary or
    polymorphic wire formats. Both are oracle-gated against the same
    DuckDB law (cdc_wire_decode / cdc_wire_decode_jvm)."""
    parsed = F.from_json(
        F.col("payload"),
        f"before struct<{PAYLOAD_DDL}>, after struct<{PAYLOAD_DDL}>",
        {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"},
    )
    return wire.select(
        "op",
        parsed.getField("before").alias("before"),
        parsed.getField("after").alias("after"),
        "source_table",
        "file_seq",
        "pos",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "txn_id",
    )
