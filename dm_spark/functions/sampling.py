"""Corpus assembly operators: deterministic stratified sampling and
sequence packing — the two steps between "cleaned corpus" and "training
batches" in a large-scale data pipeline.

Reference analog: DM samples nothing (it replicates everything), but
its config-as-pipeline idea (dm/config/task.go:279-338 — declarative
routes/filters interpreted into dataflow) is the model here: sampling
rates and pack geometry are plain data interpreted into Catalyst
expressions, never driver-side row loops.

Both operators are exact-integer and engine-neutral by construction so
the DuckDB oracle hashes bit-identically:

- sampling keys on a Knuth multiplicative hash of the id (no
  engine-specific hash function, no float thresholds);
- packing uses prefix sums of integer token counts.

Scale notes (100 TB): `stratified_sample` is a stateless filter —
no shuffle at all, fully pushdown-friendly. `pack_sequences` does one
shuffle into `n_shards` independent streams; the prefix sum inside a
shard is a single-partition window sort, so shard count must scale
with the cluster (shards ~ executors, each shard a few GB). That is
exactly how production packers run (per-worker greedy concat); a
GLOBAL pack order would serialize the corpus through one sorter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Knuth's multiplicative constant (2^32 / golden ratio) — the shared
# hash law with the SQL oracle:
#   h = ((id mod (2^31 - 1)) * K) mod 2^32
# The pre-fold keeps the product under (2^31)*K ≈ 5.7e18 < int64 max,
# so the law is overflow-safe for EVERY bigint id — the earlier
# un-folded form overflowed int64 (ANSI ArithmeticException on Spark 4,
# BIGINT overflow on DuckDB) for ids above ~3.4e9, well inside a
# 100-TB corpus's id space (review r5).
_KNUTH = 2654435761
_M31 = (1 << 31) - 1  # Mersenne prime: cheap, distribution-friendly fold
_M32 = 1 << 32


def sample_hash(id_col: F.Column, buckets: int = 1000) -> F.Column:
    """Deterministic per-id bucket in [0, buckets): Knuth multiplicative
    hash over the 2^31-1-folded id, mod 2^32, mod `buckets`. Pure
    int64 arithmetic that cannot overflow — identical in any engine,
    unlike murmur3/xxhash which are implementation-defined across
    engines."""
    return (
        ((id_col.cast("bigint") % F.lit(_M31)) * F.lit(_KNUTH)) % F.lit(_M32)
    ) % F.lit(buckets)


def stratified_sample(
    df: DataFrame,
    rates_permille: dict[str, int],
    strat_col: str = "lang",
    id_col: str = "doc_id",
    default_permille: int = 1000,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its hash bucket
    (0-999) falls under its stratum's rate-per-mille. Reproducible
    across runs and engines (no RNG state), so downstream stages can be
    re-derived instead of persisted.

    Typical use: downsample over-represented languages/sources while
    keeping low-resource strata at 1000 (keep-all). The rate map is
    interpreted into one CASE expression — a stateless filter with no
    shuffle; at 100 TB this runs entirely map-side and combines with
    scan pushdown."""
    bucket = sample_hash(F.col(id_col))
    rate = F.lit(default_permille)
    for key, permille in sorted(rates_permille.items()):
        rate = F.when(F.col(strat_col) == key, F.lit(int(permille))).otherwise(rate)
    return df.withColumn("h_bucket", bucket).where(F.col("h_bucket") < rate)


def pack_sequences(
    df: DataFrame,
    seq_len: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style pretraining layout):
    documents are concatenated in deterministic order within a shard and
    the token stream is cut into fixed `seq_len` windows; each document
    is labeled with the pack (window) its first token lands in and the
    offset inside that pack.

    Output: (doc_id, shard, n_tok, start_off, pack_id, pack_off) —
    start_off is the document's first-token position in its shard's
    concatenated stream, pack_id = start_off / seq_len,
    pack_off = start_off % seq_len. All exact integers.

    Shards are independent token streams (shard = id mod n_shards, a
    deterministic law shared with the SQL oracle); the prefix sum is a
    per-shard window, so parallelism = n_shards. Size n_shards to the
    cluster — each shard's window is a single sorted partition.
    """
    from dm_spark.functions.text import token_count

    shard = (F.col(id_col).cast("bigint") % F.lit(n_shards)).alias("shard")
    base = df.select(F.col(id_col), shard, token_count(F.col(text_col)).alias("n_tok"))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.withColumn("start_off", F.sum("n_tok").over(w) - F.col("n_tok"))
        .withColumn("pack_id", (F.col("start_off") / seq_len).cast("bigint"))
        .withColumn("pack_off", F.col("start_off") % seq_len)
    )
