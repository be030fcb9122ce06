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

from dm_spark.feed import ENVELOPE_DDL, PAYLOAD_DDL, PAYLOAD_FIELDS

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


def decode_wire(wire: DataFrame) -> DataFrame:
    """Wire rows -> typed envelope via Arrow-batched pandas decode.

    Batch shape: pandas DataFrame in, pandas DataFrame out; image
    structs are emitted as dicts (Arrow struct arrays) — no per-row
    Python UDF calls, one json.loads per event inside the batch loop
    (the same cost profile as go-mysql's per-event decode).
    """

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            befores, afters = [], []
            for p in pdf["payload"]:
                d = json.loads(p)
                befores.append(_img(d.get("before")))
                afters.append(_img(d.get("after")))
            out = pd.DataFrame(
                {
                    "op": pdf["op"],
                    "before": befores,
                    "after": afters,
                    "source_table": pdf["source_table"],
                    "file_seq": pdf["file_seq"],
                    "pos": pdf["pos"],
                    "ts": pd.to_datetime(pdf["ts_us"], unit="us"),
                    "txn_id": pdf["txn_id"],
                }
            )
            yield out

    def _img(d):
        if d is None:
            return None
        return {
            "conv_id": d.get("conv_id"),
            "turn_idx": d.get("turn_idx"),
            "role": d.get("role"),
            "text": d.get("text"),
            "tool": d.get("tool"),
            "ts": _naive_ts(d.get("ts")),
        }

    def _naive_ts(s):
        if not s:
            return None
        t = pd.Timestamp(s)
        return t.tz_convert(None) if t.tzinfo is not None else t

    _ = PAYLOAD_FIELDS  # documents the struct field contract
    return wire.mapInPandas(kernel, schema=ENVELOPE_DDL)


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
