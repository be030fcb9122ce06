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


def _next_fold_seq(index: LakeTable) -> int:
    """The engine-owned fold ordinal: strictly increasing per applied
    fold, independent of the caller's batch numbering. State folds are
    semilattices — redelivery is absorbed by the fold itself, so the
    merge gate must NEVER skip one (a caller-supplied non-increasing
    batch id silently discarded folds; review r5). The stamp also
    guarantees the merged state row wins LWW over the stored row."""
    return index._load_meta().last_batch_id + 1  # noqa: SLF001


def incremental_preference_batch(index: LakeTable, batch: DataFrame) -> None:
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

    batch_seq = _next_fold_seq(index)
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
    # the ONE best-of reward law, shared with queries_cdc.best_of_history
    from dm_spark.functions.text import distinct_token_count

    return distinct_token_count(text_col)


def incremental_best_of_batch(index: LakeTable, batch: DataFrame) -> None:
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
    batch_seq = _next_fold_seq(index)
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


# ------------------------------------------------------------ minhash index

class MinHashIndex:
    """Incremental MinHash-LSH near-dup state: the streaming complement
    of the one-shot pair generator (functions.dedup.minhash_lsh_pairs),
    same family stance as the fingerprint index above — at 100 TB
    nobody re-LSH-joins the world per micro-batch.

    State = two bucketed LakeTables under one root:
      postings  (band, bucket, doc_id)   keyed on all three — the LSH
                buckets of every KEPT doc; insert-only, idempotent
                under redelivery (the merge identity dedups).
      sigs      (doc_id, sig)            keyed on doc_id — kept docs'
                MinHash signatures, for candidate verification.
    Only KEPT docs enter the index, so index growth is O(distinct
    content), and a doc once kept is never retroactively re-labeled
    (first-writer-wins, immutable decisions — same contract as
    incremental_dedup_batch).

    Per-batch fold cost: one signature pass over the batch (Arrow
    kernel), one (band, bucket) equi-join against the postings (only
    the batch's buckets), one doc_id join for the old signatures, and
    a candidate-bounded within-batch closure — never a corpus rescan.

    Verification is by SIGNATURE-ESTIMATED Jaccard (matching
    positions / n_hashes), not exact shingle Jaccard: the index stores
    signatures (n_hashes longs per kept doc), not shingle sets (O(doc
    tokens) — unaffordable as persistent state at corpus scale). The
    estimator's std error is ~sqrt(t(1-t)/n_hashes) (≈0.06 at
    n_hashes=64, t=0.5); callers needing the exact law run the
    one-shot generator over the flagged clusters.

    Banding/bucketing law is SHARED with minhash_lsh_pairs
    (dedup.banded_signature), so a doc pair collides in the index iff
    it collides in the one-shot generator. Parameters are pinned in
    params.json at create time and re-validated on open — folding with
    drifted parameters would silently partition the corpus into
    incompatible bucket spaces.
    """

    PARAMS = ("n_hashes", "bands", "k", "seed")

    def __init__(self, spark, root: str):
        import json as _json
        import os as _os

        with open(_os.path.join(root, "params.json")) as f:
            self.params = _json.load(f)
        # re-validate on open: a truncated / hand-edited / clobbered
        # params.json must fail HERE, not as silently-deflated
        # estimates in a drifted bucket space
        if set(self.params) != set(self.PARAMS) or not all(
            isinstance(self.params[p], int) for p in self.PARAMS
        ):
            raise ValueError(
                f"{root}/params.json is corrupt: expected integer keys "
                f"{self.PARAMS}, got {self.params!r}"
            )
        if self.params["n_hashes"] % self.params["bands"]:
            raise ValueError(f"{root}/params.json: bands must divide n_hashes")
        self.postings = LakeTable(spark, _os.path.join(root, "postings"))
        self.sigs = LakeTable(spark, _os.path.join(root, "sigs"))

    @classmethod
    def create(
        cls,
        spark,
        root: str,
        n_hashes: int = 64,
        bands: int = 16,
        k: int = 3,
        seed: int = 42,
        n_buckets: int = 32,
    ) -> "MinHashIndex":
        import json as _json
        import os as _os

        if n_hashes % bands:
            raise ValueError("bands must divide n_hashes")
        # refuse BEFORE touching params.json: overwriting an existing
        # index's params would silently re-bucket future folds into a
        # space incompatible with the stored signatures
        if _os.path.exists(_os.path.join(root, "params.json")):
            raise FileExistsError(
                f"MinHash index already exists at {root} — open it with "
                "MinHashIndex(spark, root) instead of create()"
            )
        _os.makedirs(root, exist_ok=True)
        tmp = _os.path.join(root, "params.json.tmp")
        with open(tmp, "w") as f:
            _json.dump(
                {"n_hashes": n_hashes, "bands": bands, "k": k, "seed": seed}, f
            )
        _os.replace(tmp, _os.path.join(root, "params.json"))
        LakeTable.create(
            spark,
            _os.path.join(root, "postings"),
            [("band", "int"), ("bucket", "bigint"), ("doc_id", "bigint")],
            ["band", "bucket", "doc_id"],
            n_buckets=n_buckets,
        )
        LakeTable.create(
            spark,
            _os.path.join(root, "sigs"),
            [("doc_id", "bigint"), ("sig", "array<bigint>")],
            ["doc_id"],
            n_buckets=n_buckets,
        )
        return cls(spark, root)

    def fold(
        self,
        batch: DataFrame,
        threshold: float = 0.5,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Classify one batch against the accumulated index and fold
        the kept docs in. Returns (doc_id, keep_id, is_dup) for every
        batch row.

        Law, in decision order:
        1. a doc_id already IN the index stays kept (immutability —
           redelivering a kept doc can never re-label it a dup, even
           if similar docs were indexed since);
        2. a doc whose estimated Jaccard against some indexed doc
           reaches `threshold` is a dup of its best match (highest
           estimate, min doc_id tiebreak). `is_dup` is immutable for
           a given arrival order; `keep_id` names the best CURRENT
           keeper, which can differ across redeliveries as the index
           grows (disclosed, same as the reference's resolveTo);
        3. the remaining batch docs resolve among themselves: near-dup
           pairs (band collision + estimate >= threshold) close
           transitively (dedup.dup_clusters) and the min-id of each
           component is kept, the rest are its dups;
        4. kept docs' postings + signatures merge into the index
           (insert of an existing identity is a value-identical no-op,
           so redelivered folds converge)."""
        from dm_spark.functions.dedup import (
            banded_signature,
            dup_clusters,
            minhash_signatures,
        )

        # the index schemas pin doc_id as bigint: fail FAST on a
        # non-integral id instead of a mid-merge ANSI cast error (or,
        # with ANSI off, a silent NULL-key collapse of the sigs table)
        id_type = batch.schema[id_col].dataType.typeName()
        if id_type not in ("long", "integer", "short", "byte"):
            raise TypeError(
                f"MinHashIndex.fold: {id_col} must be an integral type "
                f"(index state is keyed bigint), got {id_type}"
            )
        P = self.params
        nh = P["n_hashes"]
        # one Arrow signature pass per fold, referenced by candidates /
        # verification / inserts: localCheckpoint materializes the
        # micro-batch's signatures (O(batch) rows of n_hashes longs)
        # instead of re-running the kernel per consumer
        sig = minhash_signatures(
            batch, nh, P["k"], text_col, id_col, P["seed"]
        ).localCheckpoint()
        banded = banded_signature(sig, nh, P["bands"])
        old_sigs = self.sigs.read().select(
            F.col("doc_id").alias("old_id"), F.col("sig").alias("old_sig")
        )

        est = F.size(
            F.filter(
                F.zip_with("sig", "old_sig", lambda a, b: a == b), lambda m: m
            )
        ) / F.lit(float(nh))
        # rule 1: already-kept ids keep themselves
        kept_before = sig.join(
            old_sigs.select(F.col("old_id").alias("id")), "id", "left_semi"
        ).select("id")
        # rule 2: best index match over the batch's colliding buckets
        cand_old = (
            banded.join(kept_before, "id", "left_anti")
            .join(
                self.postings.read().withColumnRenamed("doc_id", "old_id"),
                ["band", "bucket"],
            )
            .select("id", "old_id")
            .distinct()
        )
        matched = (
            cand_old.join(sig, "id")
            .join(old_sigs, "old_id")
            .select("id", "old_id", est.alias("est"))
            .where(F.col("est") >= threshold)
            .groupBy("id")
            .agg(
                F.max_by(
                    "old_id", F.struct(F.col("est"), -F.col("old_id"))
                ).alias("keep_id")
            )
            # pinned: the matched subtree (postings bucket-join +
            # distinct + index-sigs verify) otherwise re-runs once per
            # consumer — BOTH sides of the rest self-join below plus
            # the flags base (Catalyst shares no duplicated subtrees
            # across join branches; same class as the ngram hot-list).
            # O(batch) rows, deterministic (max_by tiebreaker).
            .localCheckpoint()
        )
        # rule 3: transitive min-id survivor among the still-unresolved
        # — also pinned: rest feeds its own self-join's build AND probe
        # side; without this the kept_before semi-join and the matched
        # anti-join each evaluate twice inside the pairs job.
        rest = (
            banded.join(kept_before, "id", "left_anti")
            .join(matched.select("id"), "id", "left_anti")
            .localCheckpoint()
        )
        pairs = (
            rest.alias("x")
            .join(
                rest.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.id") < F.col("y.id")),
            )
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
            .join(sig.select(F.col("id").alias("id_a"), "sig"), "id_a")
            .join(
                sig.select(F.col("id").alias("id_b"), F.col("sig").alias("old_sig")),
                "id_b",
            )
            .where(est >= threshold)
            .select("id_a", "id_b")
            .localCheckpoint()
        )
        # steady-state tail batches usually have NO within-batch pairs:
        # skip the iterative closure machinery entirely then (the
        # checkpoint above makes isEmpty() a metadata probe, and feeds
        # dup_clusters a materialized edge list otherwise)
        base = sig.select("id").join(matched, "id", "left")
        if pairs.isEmpty():
            flags = base.select(
                F.col("id").alias(id_col),
                F.coalesce("keep_id", "id").alias("keep_id"),
                (F.coalesce("keep_id", "id") != F.col("id")).alias("is_dup"),
            )
        else:
            clusters = dup_clusters(pairs)  # (id, cluster_id), verts only
            flags = base.join(clusters, "id", "left").select(
                F.col("id").alias(id_col),
                F.coalesce("keep_id", "cluster_id", "id").alias("keep_id"),
                (F.coalesce("keep_id", "cluster_id", "id") != F.col("id")).alias(
                    "is_dup"
                ),
            )
        # one evaluation of the candidate/match/cluster subtree per
        # fold: the postings merge, the sigs merge AND the caller all
        # read flags — without this each would re-run the joins and
        # re-scan the postings/sigs parquet independently
        flags = flags.localCheckpoint()
        # merge only NEWLY kept docs: rule-1 ids are already indexed
        # (a true redelivery would re-merge value-identical rows; a
        # same-id-different-content arrival would race the stored
        # signature on an equal-lineage LWW tie — excluding them keeps
        # the indexed signature immutable, matching the decision law)
        kept_now = (
            flags.where(~F.col("is_dup"))
            .select(F.col(id_col).alias("id"))
            .join(kept_before, "id", "left_anti")
        )
        lineage = [
            F.lit("I").alias("op"),
            F.timestamp_micros(F.lit(0)).alias("_cdc_ts"),
            F.lit(0).cast("bigint").alias("_cdc_file_seq"),
            F.lit(0).cast("bigint").alias("_cdc_pos"),
        ]
        self.postings.merge_into(
            banded.join(kept_now, "id", "left_semi").select(
                "band", "bucket", F.col("id").alias("doc_id"), *lineage
            ),
            batch_id=_next_fold_seq(self.postings),
        )
        self.sigs.merge_into(
            sig.join(kept_now, "id", "left_semi").select(
                F.col("id").alias("doc_id"), "sig", *lineage
            ),
            batch_id=_next_fold_seq(self.sigs),
        )
        return flags
