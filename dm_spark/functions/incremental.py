"""Incremental corpus maintenance: dedup state folded forward as CDC
batches land, instead of re-scanning the corpus every batch.

At 100 TB nobody re-dedupes the world per micro-batch: the pipeline
keeps a compact FINGERPRINT INDEX (one row per distinct content hash,
bucketed on the hash) and each incoming batch (a) classifies its rows
against the index with one bucketed equi-join and (b) inserts only the
never-seen fingerprints. Batch cost is O(batch + touched buckets),
index growth is O(distinct content), and the canonical-survivor choice
is FIRST-WRITER-WINS — stable under any later arrivals, which is what
makes incremental dedup decisions immutable (a doc once kept is never
retroactively re-labeled a dup).

Reference analog: none in pingcap/dm (it replicates rows); the state
pattern mirrors its checkpoint tables — compact state in the same lake
format as the data, advanced per batch (syncer/checkpoint.go:175-257
as the state-table precedent). Equivalence law: processing id-ordered
batches through the index equals one global exact dedup (the
doc_incremental_dedup oracle); out-of-order arrival keeps the
first-seen survivor (pinned in tests/test_incremental_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dm_spark.functions.text import fingerprint
from dm_spark.lake import LakeTable

INDEX_SCHEMA = [("fp", "string"), ("keep_id", "bigint")]


def create_fp_index(spark, path: str, n_buckets: int = 32) -> LakeTable:
    """A fingerprint index is an ordinary LakeTable keyed on the hash —
    bucketed so classification joins touch only the batch's buckets and
    commits stay O(touched)."""
    return LakeTable.create(spark, path, INDEX_SCHEMA, ["fp"], n_buckets=n_buckets)


def incremental_dedup_batch(
    index: LakeTable,
    batch: DataFrame,
    batch_seq: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Classify one batch against the accumulated index and fold the
    new fingerprints in. Returns (doc_id, fp, keep_id, is_dup) for
    every batch row; `is_dup` iff the row is not its content's
    canonical keeper (keeper = the index's first-seen id, else the
    batch's min id for content never seen before).

    The index mutation is INSERT-ONLY (never-seen fps, anti-joined
    against current state), so the first writer of a fingerprint wins
    forever and batch redelivery is convergent: a replayed batch
    re-derives identical flags and re-inserts nothing.
    """
    fps = batch.select(
        F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fp")
    )
    batch_min = fps.groupBy("fp").agg(F.min("doc_id").alias("batch_keep"))
    seen = index.read().select("fp", F.col("keep_id").alias("seen_keep"))
    merged = fps.join(batch_min, "fp").join(seen, "fp", "left")
    flags = merged.select(
        "doc_id",
        "fp",
        F.coalesce("seen_keep", "batch_keep").alias("keep_id"),
        (F.col("doc_id") != F.coalesce("seen_keep", "batch_keep")).alias("is_dup"),
    )
    inserts = (
        batch_min.join(seen, "fp", "left_anti")
        .select(
            "fp",
            F.col("batch_keep").alias("keep_id"),
            F.lit("I").alias("op"),
            F.timestamp_micros(F.lit(batch_seq)).alias("_cdc_ts"),
            F.lit(batch_seq).cast("bigint").alias("_cdc_file_seq"),
            F.lit(0).cast("bigint").alias("_cdc_pos"),
        )
    )
    index.merge_into(inserts)
    return flags


# ------------------------------------------------------------ preference index

PREF_INDEX_SCHEMA = [
    ("conv_id", "string"),
    ("turn_idx", "int"),
    ("u1_text", "string"),
    ("u1_role", "string"),
    ("u1_ts", "timestamp"),
    ("u1_fs", "bigint"),
    ("u1_pos", "bigint"),
    ("u2_text", "string"),
    ("u2_ts", "timestamp"),
    ("u2_fs", "bigint"),
    ("u2_pos", "bigint"),
    ("d_ts", "timestamp"),
    ("d_fs", "bigint"),
    ("d_pos", "bigint"),
]


def create_pref_index(spark, path: str, n_buckets: int = 32) -> LakeTable:
    """Preference-pair state: one row per (conv_id, turn_idx) holding
    the latest upsert version (u1), the latest upsert whose text
    differs from u1's (u2), and the latest delete location (d) — the
    PROVABLY SUFFICIENT compact state for exact incremental
    maintenance of queries_cdc.preference_pairs' (chosen, rejected)
    law (see incremental_preference_batch). Bucketed on the key so
    per-batch folds are bucketed equi-joins."""
    return LakeTable.create(
        spark, path, PREF_INDEX_SCHEMA, ["conv_id", "turn_idx"], n_buckets=n_buckets
    )


def incremental_preference_batch(
    index: LakeTable, batch: DataFrame, batch_seq: int = 0
) -> None:
    """Fold one flattened change batch (op/conv_id/turn_idx/role/text +
    ts/file_seq/pos or _cdc_* lineage) into the preference index —
    O(batch) per step, no corpus rescan (same state-table stance as
    incremental_dedup_batch; reference checkpoint-table precedent
    syncer/checkpoint.go:175-257).

    EXACTNESS (why three versions suffice, under any arrival order and
    redelivery): the global law's `rejected` for a key is the most
    recent upsert whose text differs from the winner's. Any version
    the fold drops is either (a) older than u2 and differing — u2 or
    u1 is always a more recent differing candidate for every possible
    future winner text — or (b) between u2 and u1 with text EQUAL to
    u1's — if a future winner W has W.text != u1.text then u1 itself
    is the more recent differing candidate; if W.text == u1.text the
    dropped version equals W too and is skipped by the law. Deletes
    only gate emission (winner-is-delete keys emit nothing until
    revived), so their max location is sufficient. Redelivered rows
    are value-identical duplicates and change nothing."""
    from pyspark.sql import Window

    fs = "_cdc_file_seq" if "_cdc_file_seq" in batch.columns else "file_seq"
    ps = "_cdc_pos" if "_cdc_pos" in batch.columns else "pos"
    rows = batch.select(
        "conv_id", "turn_idx", "op", "role", "text",
        F.col("ts").alias("ts"), F.col(fs).alias("fs"), F.col(ps).alias("pos"),
    )
    keys = rows.select("conv_id", "turn_idx").distinct()
    st = index.read().join(keys, ["conv_id", "turn_idx"])  # touched keys only
    # presence is keyed on the LOCATION columns (never NULL when the
    # version exists) — keying on text would evict a NULL-text upsert
    # from the state and break the any-arrival-order law (review r5)
    pseudo = (
        st.where(F.col("u1_fs").isNotNull()).select(
            "conv_id", "turn_idx", F.lit("I").alias("op"),
            F.col("u1_role").alias("role"), F.col("u1_text").alias("text"),
            F.col("u1_ts").alias("ts"), F.col("u1_fs").alias("fs"),
            F.col("u1_pos").alias("pos"),
        )
        .unionByName(
            st.where(F.col("u2_fs").isNotNull()).select(
                "conv_id", "turn_idx", F.lit("I").alias("op"),
                F.lit(None).cast("string").alias("role"),
                F.col("u2_text").alias("text"),
                F.col("u2_ts").alias("ts"), F.col("u2_fs").alias("fs"),
                F.col("u2_pos").alias("pos"),
            )
        )
        .unionByName(
            st.where(F.col("d_fs").isNotNull()).select(
                "conv_id", "turn_idx", F.lit("D").alias("op"),
                F.lit(None).cast("string").alias("role"),
                F.lit(None).cast("string").alias("text"),
                F.col("d_ts").alias("ts"), F.col("d_fs").alias("fs"),
                F.col("d_pos").alias("pos"),
            )
        )
    )
    u = rows.unionByName(pseudo)

    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("ts").desc(), F.col("fs").desc(), F.col("pos").desc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    up = F.col("op") != "D"
    t = u.select(
        "conv_id", "turn_idx", "op", "text", "ts", "fs", "pos",
        F.first(
            F.when(up, F.struct("text", "role", "ts", "fs", "pos")), ignorenulls=True
        ).over(wf).alias("u1"),
        F.max(F.when(~up, F.struct("ts", "fs", "pos"))).over(wf).alias("d"),
        F.row_number().over(wr).alias("rn"),
    )
    # u2 needs u1 first, so it rides a SECOND projection over the same
    # window partitioning — still one exchange, and the rn==1 filter
    # then yields the whole state row per key with no aggregation and
    # no join (review r5: the first cut paid two hash aggregates plus
    # a key join per fold)
    state = t.withColumn(
        "u2",
        F.first(
            F.when(
                up & (F.col("text") != F.col("u1.text")),
                F.struct("text", "ts", "fs", "pos"),
            ),
            ignorenulls=True,
        ).over(wf),
    ).where(F.col("rn") == 1)
    out = state.select(
        "conv_id", "turn_idx",
        F.col("u1.text").alias("u1_text"), F.col("u1.role").alias("u1_role"),
        F.col("u1.ts").alias("u1_ts"),
        F.col("u1.fs").cast("bigint").alias("u1_fs"),
        F.col("u1.pos").cast("bigint").alias("u1_pos"),
        F.col("u2.text").alias("u2_text"), F.col("u2.ts").alias("u2_ts"),
        F.col("u2.fs").cast("bigint").alias("u2_fs"),
        F.col("u2.pos").cast("bigint").alias("u2_pos"),
        F.col("d.ts").alias("d_ts"),
        F.col("d.fs").cast("bigint").alias("d_fs"),
        F.col("d.pos").cast("bigint").alias("d_pos"),
        F.lit("U").alias("op"),
        F.timestamp_micros(F.lit(batch_seq)).alias("_cdc_ts"),
        F.lit(batch_seq).cast("bigint").alias("_cdc_file_seq"),
        F.lit(0).cast("bigint").alias("_cdc_pos"),
    )
    index.merge_into(out, batch_id=batch_seq)


def preference_pairs_from_index(index: LakeTable) -> DataFrame:
    """Materialize the (chosen, rejected) pairs from the accumulated
    index: keys whose latest upsert is the overall winner (no newer
    delete), whose winner is an assistant turn, and which have a
    differing superseded version. Equals queries_cdc.preference_pairs
    (minus the history-dependent n_superseded count) over the full
    replayed stream — the cdc_preference_incremental oracle law."""
    st = index.read()
    u1_loc = F.struct("u1_ts", "u1_fs", "u1_pos")
    d_loc = F.struct(
        F.col("d_ts").alias("u1_ts"),
        F.col("d_fs").alias("u1_fs"),
        F.col("d_pos").alias("u1_pos"),
    )
    return st.where(
        F.col("u1_fs").isNotNull()
        & (F.col("d_fs").isNull() | (u1_loc > d_loc))
        & (F.col("u1_role") == "assistant")
        & F.col("u2_fs").isNotNull()
    ).select(
        "conv_id", "turn_idx",
        F.col("u1_text").alias("chosen"),
        F.col("u2_text").alias("rejected"),
    )


# ------------------------------------------------------------ best-of index

BEST_INDEX_SCHEMA = [
    ("conv_id", "string"),
    ("turn_idx", "int"),
    ("b_score", "bigint"),
    ("b_text", "string"),
    ("b_ts", "timestamp"),
    ("b_fs", "bigint"),
    ("b_pos", "bigint"),
    ("l_op", "string"),
    ("l_role", "string"),
    ("l_text", "string"),
    ("l_ts", "timestamp"),
    ("l_fs", "bigint"),
    ("l_pos", "bigint"),
]


def create_best_index(spark, path: str, n_buckets: int = 32) -> LakeTable:
    """Best-of-history state: one row per (conv_id, turn_idx) holding
    the reward-argmax non-delete version seen so far (b_*) and the
    latest event overall (l_*) — the provably sufficient compact state
    for exact incremental maintenance of
    queries_cdc.best_of_history's selection law (minus the
    history-dependent n_versions count; see
    incremental_best_of_batch). Bucketed on the key so per-batch folds
    are bucketed equi-joins."""
    return LakeTable.create(
        spark, path, BEST_INDEX_SCHEMA, ["conv_id", "turn_idx"], n_buckets=n_buckets
    )


def _bo_score(text_col):
    from dm_spark.functions.text import tokens

    return F.size(F.array_distinct(tokens(F.coalesce(text_col, F.lit(""))))).cast(
        "bigint"
    )


def incremental_best_of_batch(
    index: LakeTable, batch: DataFrame, batch_seq: int = 0
) -> None:
    """Fold one flattened change batch (op/conv_id/turn_idx/role/text +
    ts/file_seq/pos or _cdc_* lineage) into the best-of index —
    O(batch) per step, no history rescan (same state-table stance as
    incremental_preference_batch).

    EXACTNESS (why this state is sufficient under ANY arrival order
    and redelivery): both components are pure semilattice folds. The
    winner is argmax over all non-delete versions of
    (score, ts, fs, pos) — a max, so folding in any order yields the
    global max, and redelivered duplicates are absorbed idempotently.
    The emission gate needs only the latest event's (op, role, text) —
    argmax over ALL events of (ts, fs, pos), the same semilattice.
    Unlike the preference fold (which must argue three retained
    versions suffice), nothing here approximates: the fold equals the
    global law exactly — except n_versions, because a COUNT is not
    redelivery-idempotent, so the incremental surface omits it (the
    same disclosure preference_pairs_from_index makes for
    n_superseded).

    Plan shape: one bucketed key join to pull touched state, then ONE
    hash aggregate per key (max + max_by) — the pseudo-best row rides
    op='B' so it is excluded from the latest-event argmax without an
    extra column, and 'B' can never collide with a real binlog op."""
    fs = "_cdc_file_seq" if "_cdc_file_seq" in batch.columns else "file_seq"
    ps = "_cdc_pos" if "_cdc_pos" in batch.columns else "pos"
    rows = batch.select(
        "conv_id", "turn_idx", "op", "role", "text",
        _bo_score(F.col("text")).alias("score"),
        F.col("ts").alias("ts"), F.col(fs).alias("fs"), F.col(ps).alias("pos"),
    )
    keys = rows.select("conv_id", "turn_idx").distinct()
    st = index.read().join(keys, ["conv_id", "turn_idx"])  # touched keys only
    pseudo = (
        st.where(F.col("b_fs").isNotNull())
        .select(
            "conv_id", "turn_idx", F.lit("B").alias("op"),
            F.lit(None).cast("string").alias("role"),
            F.col("b_text").alias("text"), F.col("b_score").alias("score"),
            F.col("b_ts").alias("ts"), F.col("b_fs").alias("fs"),
            F.col("b_pos").alias("pos"),
        )
        .unionByName(
            st.select(
                "conv_id", "turn_idx", F.col("l_op").alias("op"),
                F.col("l_role").alias("role"), F.col("l_text").alias("text"),
                _bo_score(F.col("l_text")).alias("score"),
                F.col("l_ts").alias("ts"), F.col("l_fs").alias("fs"),
                F.col("l_pos").alias("pos"),
            )
        )
    )
    u = rows.unionByName(pseudo)
    agg = u.groupBy("conv_id", "turn_idx").agg(
        F.max(
            F.when(F.col("op") != "D", F.struct("score", "ts", "fs", "pos", "text"))
        ).alias("b"),
        F.max_by(
            F.struct("op", "role", "text", "ts", "fs", "pos"),
            F.when(F.col("op") != "B", F.struct("ts", "fs", "pos")),
        ).alias("l"),
    )
    out = agg.select(
        "conv_id", "turn_idx",
        F.col("b.score").alias("b_score"), F.col("b.text").alias("b_text"),
        F.col("b.ts").alias("b_ts"),
        F.col("b.fs").cast("bigint").alias("b_fs"),
        F.col("b.pos").cast("bigint").alias("b_pos"),
        F.col("l.op").alias("l_op"), F.col("l.role").alias("l_role"),
        F.col("l.text").alias("l_text"), F.col("l.ts").alias("l_ts"),
        F.col("l.fs").cast("bigint").alias("l_fs"),
        F.col("l.pos").cast("bigint").alias("l_pos"),
        F.lit("U").alias("op"),
        F.timestamp_micros(F.lit(batch_seq)).alias("_cdc_ts"),
        F.lit(batch_seq).cast("bigint").alias("_cdc_file_seq"),
        F.lit(0).cast("bigint").alias("_cdc_pos"),
    )
    index.merge_into(out, batch_id=batch_seq)


def best_of_from_index(index: LakeTable) -> DataFrame:
    """Materialize the best-of selections from the accumulated index:
    keys whose latest event is a surviving assistant turn emit their
    reward-argmax version. Equals queries_cdc.best_of_history (minus
    the history-dependent n_versions count) over the full replayed
    stream — the cdc_best_of_incremental oracle law."""
    st = index.read()
    return st.where(
        (F.col("l_op") != "D")
        & (F.col("l_role") == "assistant")
        & F.col("b_fs").isNotNull()
    ).select(
        "conv_id", "turn_idx",
        F.col("b_score").alias("best_score"),
        F.md5(F.coalesce(F.col("b_text"), F.lit(""))).alias("best_fp"),
        (
            F.coalesce(F.col("b_text"), F.lit(""))
            == F.coalesce(F.col("l_text"), F.lit(""))
        )
        .cast("int")
        .alias("best_is_lww"),
    )
