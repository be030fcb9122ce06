"""Training-data pipeline queries over documents/embeddings/events,
with DuckDB oracles where ANSI-SQL-expressible (MinHash/SimHash/LSH-ANN
use engine-internal hash laws — rows-only checks, by design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dm_spark.functions.dedup import (
    dup_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from dm_spark.functions.multimodal import attach_fake_media, decode_and_featurize
from dm_spark.functions.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
)
from dm_spark.functions.text import (
    EN_STOPWORDS,
    PII_EMAIL_RE,
    PII_IP_RE,
    PII_PHONE_RE,
    quality_columns,
)


def _docs(spark, sf_dir):
    from dm_spark.scan import parallelize_scan

    # shingle hashing / signature kernels are per-row heavy; a
    # one-row-group fixture scan would run them single-core (scan.py)
    return parallelize_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _doc_buckets(sf_dir, default: int = 16) -> int:
    """Scale-adaptive bucket count for the incremental-index fixture
    lakes (~25k docs per bucket, power of two in [4, 32]) — same law
    and rationale as queries_cdc._fixture_buckets; bucket count only
    shapes layout, never results."""
    from dm_spark.scan import parquet_num_rows

    n = parquet_num_rows(f"{sf_dir}/documents.parquet")
    if n is None:
        return default
    nb = 4
    while nb < 32 and n > nb * 25_000:
        nb *= 2
    return nb


def _doc_id_max(spark, sf_dir) -> int:
    """max(doc_id) for the incremental-fold batch windows, from parquet
    FOOTER statistics when available (zero Spark jobs — guide §1/§6; the
    batch cuts only need the upper bound), falling back to the agg job."""
    from dm_spark.scan import parquet_column_bounds

    b = parquet_column_bounds(f"{sf_dir}/documents.parquet", "doc_id")
    if b is not None:
        return int(b[1])
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg(F.max("doc_id"))
        .collect()[0][0]
        or 0
    )


def _embs(spark, sf_dir):
    # NOT parallelize_scan'd: the embedding kernels are mapInPandas —
    # splitting a small fixture over 32 partitions costs a python
    # worker spin-up (~0.15-0.3s incl. numpy import, reuse=false) per
    # task per python stage, which MEASURED as a net loss at sf0.1
    # (emb_ann_lsh 7.1 -> 8.2s); the doc readers win because their
    # heavy per-row work (shingle hashing) is JVM codegen.
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _events(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


# ------------------------------------------------------------- events

def q_events_tumbling_agg(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
            F.min("event_id").alias("min_eid"),
            F.max("event_id").alias("max_eid"),
        )
    )


def q_events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30 min) per user — the classic
    streaming session-window expressed as lag+cumsum."""
    ev = _events(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (
                F.col("prev_ts").isNull()
                | ((F.unix_micros("ts") - F.unix_micros("prev_ts")) > 1800 * 1_000_000)
            ).cast("int"),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy("user_id", "sess_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("event_id").alias("first_eid"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
        )
    )


def q_events_asof_join(spark, sf_dir):
    """As-of (point-in-time) join: each purchase attaches the latest
    view by the same user at or before it — ONE shuffle on user_id via
    the union-and-window composition (see functions/temporal.asof_join;
    a naive SQL formulation is a per-key quadratic join). The DuckDB
    oracle uses its native ASOF JOIN as an independent implementation."""
    from dm_spark.functions.temporal import asof_join

    base = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    left = base.where(F.col("event_type") == "purchase").drop("event_type")
    right = base.where(F.col("event_type") == "view").drop("event_type")
    out = asof_join(
        left, right, on=["user_id"], right_payload=["event_id"], tiebreak="event_id"
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("event_id_r").alias("view_event_id"),
        F.col("ts_us_r").alias("view_ts_us"),
    )


def q_events_range_join(spark, sf_dir):
    """Bounded range join: clicks in the 10 minutes before each error,
    per user — time-bucketed equi-join (2 probe buckets per row, exact
    refine) instead of the cartesian plan a range predicate naively
    produces. Independent naive range-join oracle in DuckDB."""
    from dm_spark.functions.temporal import range_count_join

    base = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    err = base.where(F.col("event_type") == "error").drop("event_type")
    clk = base.where(F.col("event_type") == "click").select("user_id", "ts_us")
    return range_count_join(
        err, clk, on=["user_id"], window_us=600_000_000, count_col="n_clicks_10m"
    )


# ----------------------------------------------- relational baselines
# The reference is not a query engine (SURVEY §2.6), but the rebuild's
# pipeline composes Spark's relational primitives — these exercise the
# agg/join/window kernels the CDC path relies on, with exact-integer
# outputs (cents) so oracles hash identically.


def q_lineitem_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped aggregate over lineitem."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cents = lambda c: F.round(F.col(c) * 100).cast("bigint")  # noqa: E731
    return (
        li.where(F.col("l_shipdate") < "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("sum_qty"),
            F.sum(cents("l_extendedprice")).alias("sum_price_cents"),
            F.sum(cents("l_discount")).alias("sum_disc_cents"),
            F.min("l_orderkey").alias("min_ok"),
            F.max("l_orderkey").alias("max_ok"),
        )
    )


def q_top_orders_per_customer(spark, sf_dir):
    """Top-3 orders by totalprice per customer (window top-k)."""
    from pyspark.sql import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("o_custkey", "rank", "o_orderkey")
    )


def q_nation_revenue(spark, sf_dir):
    """orders x customer x nation: broadcast-joined rollup."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("revenue_cents"),
            F.count_distinct("c_custkey").alias("n_customers"),
        )
    )


# ---------------------------------------------------------- documents

def q_doc_exact_dedup(spark, sf_dir):
    return exact_dedup(_docs(spark, sf_dir))


def q_doc_exact_dedup_norm(spark, sf_dir):
    """Exact dedup over the CANONICAL text form (lowercase, punct
    stripped, whitespace collapsed) — what production exact dedup
    actually keys on; catches case/spacing near-copies."""
    from dm_spark.functions.text import normalized_text

    docs = _docs(spark, sf_dir).withColumn("text", normalized_text(F.col("text")))
    return exact_dedup(docs)


def q_doc_quality(spark, sf_dir):
    return quality_columns(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "n_stopwords", "n_punct", "n_chars_calc", "is_en_pred", "fp"
    )


def q_doc_langid(spark, sf_dir):
    q = quality_columns(_docs(spark, sf_dir))
    return q.select(
        "doc_id",
        "lang",
        "is_en_pred",
        (F.col("is_en_pred") == (F.col("lang") == "en")).alias("agrees"),
    )


def q_doc_ngram_jaccard(spark, sf_dir):
    """max_df guard ON by default: a stop-shingle shared by >100 docs is
    dropped before the self-join, bounding the join's per-key fan-out —
    at 100 TB an unguarded hot shingle makes the join quadratic on that
    key. The oracle applies the identical rule."""
    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5, k=3, max_df=100)



def _cluster_labels(docs):
    """Every doc labeled with its near-dup component's min id
    (singletons label themselves) — shared by q_doc_dup_clusters and
    q_doc_split_dedup_safe; the edge law is the jaccard>=0.5 pair
    graph with the max_df hot-shingle cap."""
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, k=3, max_df=100)
    comp = dup_clusters(pairs).withColumnRenamed("id", "doc_id")
    return docs.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
    )


def q_doc_dup_clusters(spark, sf_dir):
    """Pair graph -> duplicate clusters: every document labeled with
    the min doc_id of its near-dup connected component (transitive
    closure over the same jaccard>=0.5 pairs as doc_ngram_jaccard)
    plus the cluster size. Iterative min-label propagation with
    pointer jumping (see dup_clusters); the oracle is a recursive CTE
    computing min reachable id."""
    from pyspark.sql import Window

    lab = _cluster_labels(_docs(spark, sf_dir))
    w = Window.partitionBy("cluster_id")
    return lab.select(
        "doc_id", "cluster_id", F.count(F.lit(1)).over(w).alias("cluster_size")
    )


def q_doc_split_dedup_safe(spark, sf_dir):
    """Contamination-safe train/heldout split: the split hash is keyed
    on the near-dup CLUSTER id, not the doc id, so near-duplicates can
    NEVER straddle the boundary — the leakage mode a naive per-doc
    split has (a paraphrase of a heldout doc lands in train and the
    eval silently measures memorization). Composes the jaccard>=0.5
    pair graph -> transitive closure (dup_clusters) with the
    engine-portable Knuth split hash (sample_hash); 90/10 by cluster.

    Scale shape: the closure is the audited equi-join iteration
    (doc_dup_clusters); the split itself is a stateless projection —
    no extra shuffle over the labeled table."""
    from dm_spark.functions.sampling import sample_hash

    lab = _cluster_labels(_docs(spark, sf_dir))
    return lab.select(
        "doc_id",
        "cluster_id",
        F.when(sample_hash(F.col("cluster_id")) < 900, F.lit("train"))
        .otherwise(F.lit("heldout"))
        .alias("split"),
    )


def q_emb_dup_clusters(spark, sf_dir):
    """Semantic duplicate clusters: transitive closure over the
    embedding-cosine near-dup pair graph (cos >= 0.4 — the same edge
    law as emb_near_dup, so its documented float-boundary caveat
    applies), every vector labeled with its component's min vec_id
    plus the cluster size — the survivor table an embedding-dedup
    pipeline keeps. At 100 TB the pair generator swaps to
    embedding_near_dup_pairs_lsh (identical edge law, recall-pinned);
    the exact generator here keeps the DuckDB oracle shared. Closure
    via dup_clusters' pointer-jumping min-label propagation (O(log d)
    shuffle rounds)."""
    from pyspark.sql import Window

    from dm_spark.functions.similarity import embedding_near_dup_pairs

    embs = _embs(spark, sf_dir)
    pairs = embedding_near_dup_pairs(embs, min_cos=0.4)
    comp = dup_clusters(pairs).withColumnRenamed("id", "vec_id")
    lab = embs.select("vec_id").join(comp, "vec_id", "left").select(
        "vec_id", F.coalesce("cluster_id", F.col("vec_id")).alias("cluster_id")
    )
    w = Window.partitionBy("cluster_id")
    return lab.select(
        "vec_id", "cluster_id", F.count(F.lit(1)).over(w).alias("cluster_size")
    )


def q_doc_contamination(spark, sf_dir):
    """Benchmark decontamination: docs with doc_id % 37 == 0 stand in
    for the held-out eval set; every other doc reports how many of its
    distinct 3-gram shingles appear anywhere in that set. The benchmark
    shingle set is broadcast — no corpus-side shuffle."""
    from dm_spark.functions.dedup import contamination_check

    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 37 == 0)
    corpus = docs.where(F.col("doc_id") % 37 != 0)
    return contamination_check(corpus, bench, k=3, flag_pct=10)


def q_doc_repetition(spark, sf_dir):
    """Gopher-style bigram-repetition quality signals (integer laws
    shared with the oracle)."""
    from dm_spark.functions.text import repetition_signals

    return repetition_signals(_docs(spark, sf_dir))


def q_doc_stratified_sample(spark, sf_dir):
    """Deterministic per-language downsampling: en kept at 40%, zh at
    70%, the rest at 100% — the rebalancing step of a corpus mix. Knuth
    multiplicative hash => engine-neutral, reproducible, shuffle-free."""
    from dm_spark.functions.sampling import stratified_sample

    out = stratified_sample(
        _docs(spark, sf_dir), {"en": 400, "zh": 700}, strat_col="lang"
    )
    return out.select("doc_id", "lang", "source", "h_bucket")


def q_doc_pack_sequences(spark, sf_dir):
    """Concat-and-chunk packing into 256-token windows over 8
    deterministic shards (see pack_sequences for the 100-TB shape)."""
    from dm_spark.functions.sampling import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), seq_len=256, n_shards=8)


def q_doc_incremental_dedup(spark, sf_dir):
    """Incremental dedup equivalence law: folding the corpus through
    the fingerprint index in 5 id-ordered batches must equal ONE global
    exact dedup (same fp -> min doc_id survivor). This is the 100-TB
    shape — per-batch cost O(batch), no corpus rescan — proven against
    the global-aggregation oracle."""
    import tempfile

    from dm_spark.functions.incremental import (
        create_fp_index,
        incremental_dedup_batch,
    )

    docs = _docs(spark, sf_dir)
    hi = _doc_id_max(spark, sf_dir)
    index = create_fp_index(
        spark, tempfile.mkdtemp(prefix="dm_q_fpidx_"), n_buckets=_doc_buckets(sf_dir)
    )
    step = hi // 5 + 1
    for i in range(5):
        batch = docs.where(
            (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
        )
        incremental_dedup_batch(index, batch, batch_seq=i)
    return index.read().select("fp", "keep_id")


def q_doc_incremental_minhash(spark, sf_dir):
    """Incremental MinHash-LSH near-dup: fold the corpus through the
    persistent postings+signature index in 3 id-ordered batches —
    per-batch cost O(batch), no corpus re-LSH — and return every doc's
    (keep_id, is_dup) verdict. Rows-only by design (engine-internal
    hash law); the shared-banding agreement with the one-shot
    generator and the first-writer/redelivery/closure laws are pinned
    in test_minhash_index."""
    import tempfile

    from dm_spark.functions.incremental import MinHashIndex

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    hi = _doc_id_max(spark, sf_dir)
    idx = MinHashIndex.create(
        spark, tempfile.mkdtemp(prefix="dm_q_mhidx_"), n_buckets=_doc_buckets(sf_dir)
    )
    step = hi // 3 + 1
    parts = []
    for i in range(3):
        batch = docs.where(
            (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
        )
        # fold() returns checkpointed verdicts, so each part is pinned
        # to the index state AT FOLD TIME even as later folds mutate it
        parts.append(idx.fold(batch, threshold=0.5))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.select(
        "doc_id", "keep_id", F.col("is_dup").cast("int").alias("is_dup")
    )


def q_doc_vocab_topk(spark, sf_dir):
    """Vocabulary induction: corpus-wide top-200 tokens by occurrence
    (total order: count DESC, token ASC — boundary ties can't split
    engines). One map-side-combinable shuffle on the token, then
    Spark's TakeOrdered top-k — NO global sort or single-partition
    window at any corpus size."""
    from dm_spark.functions.text import tokens

    ex = _docs(spark, sf_dir).select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    agg = ex.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n_occ"), F.count_distinct("doc_id").alias("n_docs")
    )
    return agg.orderBy(F.col("n_occ").desc(), F.col("tok").asc()).limit(200)


def q_doc_mix_report(spark, sf_dir):
    """Corpus-mix report around the sampling step: per language, doc
    and token volumes before vs after the deterministic stratified
    rates (en 400‰, zh 700‰, rest keep-all) — the table a data-mix
    review reads. Pure aggregation over the same Knuth-hash law as
    doc_stratified_sample."""
    from dm_spark.functions.sampling import sample_hash
    from dm_spark.functions.text import token_count

    rate = (
        F.when(F.col("lang") == "en", 400)
        .when(F.col("lang") == "zh", 700)
        .otherwise(1000)
    )
    d = (
        _docs(spark, sf_dir)
        .withColumn("n_tok", token_count(F.col("text")))
        .withColumn("kept", (sample_hash(F.col("doc_id")) < rate).cast("int"))
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum("kept").alias("n_docs_sampled"),
        F.sum(F.col("kept") * F.col("n_tok")).alias("n_tokens_sampled"),
    )


def temp_mix(docs):
    """Temperature-smoothed multilingual sampling shares (the
    alpha=0.5 exponentiated-weight mix of XLM-R / multilingual LM
    training: w_l ∝ n_l^alpha upweights tail languages) as an EXACT
    integer law so the cross-engine hash can gate it: per-language
    weight s_l = floor(sqrt(token count)) — correctly-rounded double
    sqrt is exact under 2^52, so floor is engine-stable — and shares
    as parts-per-million by integer floor division. Emits raw vs
    smoothed ppm side by side: the table a data-mix reviewer reads to
    set per-language sampling rates.

    Scale shape: one map-side-combinable groupBy on lang (cardinality
    = #languages), then a broadcast of the one-row totals — no second
    shuffle, no window over an unpartitioned frame."""
    from dm_spark.functions.text import token_count

    d = docs.withColumn("n_tok", token_count(F.col("text")))
    per = (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .withColumn("s", F.floor(F.sqrt(F.col("n_tokens"))).cast("bigint"))
    )
    tot = per.agg(
        F.sum("n_tokens").alias("tot_tokens"), F.sum("s").alias("tot_s")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.expr("CAST((1000000 * n_tokens) div tot_tokens AS BIGINT)").alias("raw_ppm"),
        F.expr("CAST((1000000 * s) div tot_s AS BIGINT)").alias("temp_ppm"),
    )


def q_doc_temp_mix(spark, sf_dir):
    """Temperature-smoothed sampling shares over the documents table
    (see temp_mix)."""
    return temp_mix(_docs(spark, sf_dir))


def q_doc_lm_score(spark, sf_dir):
    """CCNet-style unigram-LM quality scoring over the corpus itself
    (see functions.text.unigram_lm_bits): per-document corpus-frequency
    evidence with an exact-integer head/middle/tail split relative to
    the corpus mean."""
    from dm_spark.functions.text import unigram_lm_bits

    return unigram_lm_bits(_docs(spark, sf_dir))


def q_doc_minhash_lsh(spark, sf_dir):  # rows-only (numpy hash law)
    return minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.5)


def q_doc_simhash(spark, sf_dir):  # rows-only (numpy hash law)
    return simhash_near_pairs(_docs(spark, sf_dir), max_hamming=8)


def q_doc_bpe_tokens(spark, sf_dir):
    from dm_spark.functions.text import bpe_ish_tokens

    d = _docs(spark, sf_dir)
    toks = bpe_ish_tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.filter(toks, lambda x: x.rlike("^[A-Za-z]+$"))).alias("n_word_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


def q_multimodal_frames(spark, sf_dir):
    from dm_spark.functions.multimodal import frame_sample

    media = attach_fake_media(_docs(spark, sf_dir))
    return frame_sample(media)


def q_multimodal_decode(spark, sf_dir):
    media = attach_fake_media(_docs(spark, sf_dir))
    return decode_and_featurize(media).select("doc_id", "n_bytes", "n_frames")


# --------------------------------------------------------- embeddings

def q_emb_cosine_topk(spark, sf_dir):
    return cosine_topk_bruteforce(_embs(spark, sf_dir), k=3)


def q_emb_near_dup(spark, sf_dir):
    # Known boundary risk (reviewed, accepted): the 0.4 cosine threshold
    # is evaluated independently by Spark (F.aggregate dot/norm) and
    # DuckDB (list_cosine_similarity); a pair within a few ulps of the
    # threshold could split between engines on some dataset. The gate
    # would fail LOUDLY (hash mismatch), never silently — and the
    # generated testdata has no boundary pair (stable across rounds).
    # Every other query removes this class with exact-integer outputs.
    """Embedding-cosine near-duplicate pairs (cos >= 0.4, id_a < id_b) —
    exact all-pairs baseline, a small-sf correctness slot like
    emb_cosine_topk; the scale path is emb_near_dup_lsh."""
    return embedding_near_dup_pairs(_embs(spark, sf_dir), min_cos=0.4)


def q_emb_near_dup_lsh(spark, sf_dir):  # rows-only (recall < 1 by design)
    """Embedding near-dup at scale: LSH (table, bucket) equi-join
    candidates + exact cosine verify >= 0.4. Plane count scales log2
    with the corpus, so bucket size — and the per-vector candidate
    volume — stays flat as data grows; pairs recall vs the exact
    baseline is pinned in test_similarity_recall."""
    from dm_spark.functions.similarity import _estimate_rows

    embs = _embs(spark, sf_dir)
    # footer-exact row count (zero-job) — a plain parquet scan's footer
    # sum IS the count, so the derived plane count is unchanged
    return embedding_near_dup_pairs_lsh(
        embs, min_cos=0.4, n_tables=4, n_rows=_estimate_rows(embs, "q_emb_near_dup_lsh")
    )


def q_emb_ann_ivf(spark, sf_dir):  # rows-only (recall < 1 by design)
    """IVF list count scales with the corpus (~64 vectors per list) so
    candidates per query stay bounded as data grows — the property that
    makes this the 100-TB path; probe count scales ~2*sqrt(n_lists)
    (the standard IVF practice), so per-query cost grows only with the
    square root of the corpus.

    Honest recall law, measured on the sandbox fixtures: on embeddings
    WITH cluster structure (every real text/image encoder), recall is
    governed by whether the quantizer recovers the clusters — 0.99
    recall@3 at a 6% probe share on the clustered fixture
    (test_ivf_high_recall_on_clustered_embeddings). On the synthetic
    NEAR-RANDOM testdata vectors there is no structure to exploit and
    recall necessarily tracks the scanned share (sf0.1 curve: probe
    6/31 -> 0.56, 14/31 -> 0.84, 20/31 -> 0.94) — the regime where NO
    sublinear index can win (Rubinstein 2018 hardness). The sqrt law
    keeps the shipped default in the right place on both curves."""
    import math

    from dm_spark.functions.similarity import _estimate_rows

    embs = _embs(spark, sf_dir)
    n = _estimate_rows(embs, "q_emb_ann_ivf")  # footer-exact, zero-job
    n_lists = max(8, n // 64)
    n_probe = min(n_lists, max(6, math.ceil(2 * math.sqrt(n_lists))))
    return cosine_topk_ivf(
        embs, k=3, n_lists=n_lists, n_probe=n_probe, n_rows=n
    ).select("vec_id", "rank", "neighbor_id")


def q_emb_ann_lsh(spark, sf_dir):  # rows-only (recall < 1 by design)
    """LSH-forest ANN: 4 independent hash tables, each with planes
    scaling log2 with the corpus (~64 vectors per bucket) + hamming-1
    multiprobe within each table. Candidate budget
    ~4*(planes+1)*64 per query, flat in data size; the independent
    tables are what lift recall@3 past 0.9 (single-table multiprobe
    plateaued at 0.67, VERDICT r02 #1)."""
    import math

    from dm_spark.functions.similarity import _estimate_rows

    embs = _embs(spark, sf_dir)
    n = _estimate_rows(embs, "q_emb_ann_lsh")  # footer-exact, zero-job
    planes = max(3, int(math.log2(max(n, 128) / 64)))
    return cosine_topk_lsh(embs, k=3, n_planes=planes, n_tables=4).select(
        "vec_id", "rank", "neighbor_id"
    )


# deterministic PII-injection laws for q_doc_pii_redact (the synthetic
# corpus carries no organic PII; the query plants typed PII at known
# doc_id residues so redaction is exercised — same trick as
# q_doc_contamination's doc_id % 37 eval split). Shared with the oracle.
_PII_HEADER_DOC = 7  # every 7th doc gets an email appended
_PII_IP_DOC = 11  # every 11th doc gets an IPv4
_PII_PHONE_DOC = 13  # every 13th doc gets a phone-shaped run


def q_doc_pii_redact(spark, sf_dir):
    """PII scrub over the corpus: per-doc counts of each PII class plus
    the md5 of the redacted text. Stateless JVM projection — the 100-TB
    plan is scan -> project -> (downstream), zero shuffles."""
    from dm_spark.functions.text import redact_pii

    docs = _docs(spark, sf_dir)
    d = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(
            d % _PII_HEADER_DOC == 0,
            F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            d % _PII_IP_DOC == 0,
            F.concat(
                F.lit(" from 10."),
                (d % 256).cast("string"),
                F.lit(".0."),
                (d % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % _PII_PHONE_DOC == 0,
            F.concat(
                F.lit(" call +1 555 01"),
                F.lpad((d % 100).cast("string"), 2, "0"),
                F.lit(" 99"),
            ),
        ).otherwise(F.lit("")),
    )
    out = redact_pii(docs.withColumn("text", injected))
    return out.select(
        "doc_id",
        "n_emails",
        "n_ips",
        "n_phones",
        "has_pii",
        F.md5("redacted").alias("red_fp"),
    )


def q_doc_quality_filter(spark, sf_dir):
    """Composite keep/drop verdict with a reason bitmask — the corpus
    pipeline's gate stage (C4/Gopher rules; see
    functions/text.quality_filter)."""
    from dm_spark.functions.text import quality_filter

    return quality_filter(_docs(spark, sf_dir))


# line law for q_doc_line_dedup: the synthetic corpus is single-line, so
# the query decomposes each doc into fixed 64-char segments and plants
# boilerplate — a shared header on every doc and a footer on every 5th —
# exactly the nav-bar/license-footer shapes CCNet line-dedup removes.
# Real corpora pass split(text, '\n') instead; the law is shared with
# the oracle verbatim.
_LD_HEADER = "subscribe to our newsletter terms of service apply all rights reserved"
_LD_FOOTER = "copyright example corp all rights reserved contact us for details"
_LD_WIDTH = 64
_LD_FOOTER_DOC = 5


def q_doc_line_dedup(spark, sf_dir):
    from dm_spark.functions.dedup import line_dedup

    docs = _docs(spark, sf_dir)
    c = F.col("text")
    d = F.col("doc_id")
    n_chunks = F.greatest(
        F.floor((F.length(c) - 1) / _LD_WIDTH).cast("int"), F.lit(0)
    )
    # substr over the raw attribute inside the lambda is per-element
    # free (the O(n^2) trap is DERIVED arrays inside lambdas — CLAUDE.md)
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks),
        lambda i: c.substr(i * _LD_WIDTH + 1, F.lit(_LD_WIDTH)),
    )
    lines = F.concat(
        F.array(F.lit(_LD_HEADER)),
        chunks,
        F.when(d % _LD_FOOTER_DOC == 0, F.array(F.lit(_LD_FOOTER))).otherwise(
            F.array().cast("array<string>")
        ),
    )
    return line_dedup(docs, lines)


QUERIES = {
    "lineitem_pricing_summary": q_lineitem_pricing_summary,
    "top_orders_per_customer": q_top_orders_per_customer,
    "nation_revenue": q_nation_revenue,
    "events_tumbling_agg": q_events_tumbling_agg,
    "events_sessionize": q_events_sessionize,
    "events_asof_join": q_events_asof_join,
    "events_range_join": q_events_range_join,
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_exact_dedup_norm": q_doc_exact_dedup_norm,
    "doc_quality": q_doc_quality,
    "doc_langid": q_doc_langid,
    "doc_ngram_jaccard": q_doc_ngram_jaccard,
    "doc_dup_clusters": q_doc_dup_clusters,
    "doc_split_dedup_safe": q_doc_split_dedup_safe,
    "doc_contamination": q_doc_contamination,
    "doc_repetition": q_doc_repetition,
    "doc_pii_redact": q_doc_pii_redact,
    "doc_quality_filter": q_doc_quality_filter,
    "doc_line_dedup": q_doc_line_dedup,
    "doc_stratified_sample": q_doc_stratified_sample,
    "doc_pack_sequences": q_doc_pack_sequences,
    "doc_incremental_dedup": q_doc_incremental_dedup,
    "doc_incremental_minhash": q_doc_incremental_minhash,
    "doc_vocab_topk": q_doc_vocab_topk,
    "doc_mix_report": q_doc_mix_report,
    "doc_temp_mix": q_doc_temp_mix,
    "doc_lm_score": q_doc_lm_score,
    "doc_minhash_lsh": q_doc_minhash_lsh,
    "doc_simhash": q_doc_simhash,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_frames": q_multimodal_frames,
    "doc_bpe_tokens": q_doc_bpe_tokens,
    "emb_cosine_topk": q_emb_cosine_topk,
    "emb_near_dup": q_emb_near_dup,
    "emb_dup_clusters": q_emb_dup_clusters,
    "emb_near_dup_lsh": q_emb_near_dup_lsh,
    "emb_ann_lsh": q_emb_ann_lsh,
    "emb_ann_ivf": q_emb_ann_ivf,
}

_SW = ", ".join(f"'{w}'" for w in EN_STOPWORDS)

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"

_SHINGLES = f"""
docs_sh AS (
  SELECT doc_id, toks,
    CASE WHEN len(toks) >= 3 THEN
      list_distinct(list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
    ELSE [] END AS shingles
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
)
"""

# shared recursive near-dup closure: shingle pairs -> jaccard edges ->
# min-reachable-id components -> every doc labeled (singletons label
# themselves); doc_dup_clusters and doc_split_dedup_safe both build on it
_CLUSTER_LAB = f"""
      WITH RECURSIVE {_SHINGLES},
      ex0 AS (
        SELECT doc_id AS id, len(shingles) AS sz, unnest(shingles) AS s
        FROM docs_sh),
      hot AS (SELECT s FROM ex0 GROUP BY s HAVING count(*) > 100),
      ex AS (SELECT * FROM ex0 WHERE s NOT IN (SELECT s FROM hot)),
      pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter,
               any_value(a.sz) AS size_a, any_value(b.sz) AS size_b
        FROM ex a JOIN ex b ON a.s = b.s AND a.id < b.id
        GROUP BY 1, 2),
      jp AS (
        SELECT id_a, id_b FROM pairs
        WHERE inter * 1.0 / (size_a + size_b - inter) >= 0.5),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM jp
        UNION SELECT id_b, id_a FROM jp),
      reach(id, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
      comp AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
      lab AS (
        SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
"""

ORACLES = {
    "lineitem_pricing_summary": """
      SELECT l_returnflag, l_linestatus, count(*) AS n,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
             CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
             min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
      FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
      GROUP BY 1, 2
    """,
    "top_orders_per_customer": """
      WITH r AS (
        SELECT o_custkey, o_orderkey, row_number() OVER (
          PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        FROM orders)
      SELECT o_custkey, rank, o_orderkey FROM r WHERE rank <= 3
    """,
    "nation_revenue": """
      SELECT n_name, count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
             count(DISTINCT c_custkey) AS n_customers
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1
    """,
    "events_tumbling_agg": """
      SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
             count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
             min(event_id) AS min_eid, max(event_id) AS max_eid
      FROM events GROUP BY 1, 2
    """,
    "events_sessionize": """
      WITH s AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events),
      m AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_sess FROM s),
      g AS (
        SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sess_id FROM m),
      per AS (
        SELECT user_id, sess_id, count(*) AS n_events FROM g GROUP BY 1, 2)
      SELECT user_id, count(*) AS n_sessions, CAST(sum(n_events) AS BIGINT) AS n_events,
             max(n_events) AS max_session_events
      FROM per GROUP BY 1
    """,
    "events_asof_join": """
      WITH p AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'purchase'),
      v AS (
        SELECT event_id AS view_event_id, user_id, epoch_us(ts) AS view_ts_us
        FROM events WHERE event_type = 'view')
      SELECT p.event_id, p.user_id, p.ts_us, v.view_event_id, v.view_ts_us
      FROM p ASOF LEFT JOIN v
        ON p.user_id = v.user_id AND p.ts_us >= v.view_ts_us
    """,
    "events_range_join": """
      WITH e AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'error'),
      c AS (
        SELECT user_id, epoch_us(ts) AS c_us
        FROM events WHERE event_type = 'click'),
      j AS (
        SELECT e.event_id, count(*) AS n
        FROM e JOIN c ON c.user_id = e.user_id
          AND c.c_us > e.ts_us - 600000000 AND c.c_us <= e.ts_us
        GROUP BY 1)
      SELECT e.event_id, e.user_id, e.ts_us,
             CAST(coalesce(j.n, 0) AS BIGINT) AS n_clicks_10m
      FROM e LEFT JOIN j ON j.event_id = e.event_id
    """,
    "doc_exact_dedup": """
      SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_dupes
      FROM documents GROUP BY 1
    """,
    "doc_exact_dedup_norm": """
      SELECT md5(trim(regexp_replace(
               regexp_replace(lower(text), '[\\.,;:!\\?]', '', 'g'),
               '\\s+', ' ', 'g'))) AS fp,
             min(doc_id) AS keep_id, count(*) AS n_dupes
      FROM documents GROUP BY 1
    """,
    "doc_quality": f"""
      SELECT doc_id,
        len({_TOKS}) AS n_tokens,
        len(list_filter({_TOKS}, x -> lower(x) IN ({_SW}))) AS n_stopwords,
        length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS n_punct,
        length(text) AS n_chars_calc,
        CASE WHEN len({_TOKS}) > 0 THEN
          (len(list_filter({_TOKS}, x -> lower(x) IN ({_SW}))) * 100 / len({_TOKS})) >= 10
        ELSE FALSE END AS is_en_pred,
        md5(text) AS fp
      FROM documents
    """,
    "doc_langid": f"""
      WITH q AS (
        SELECT doc_id, lang,
          CASE WHEN len({_TOKS}) > 0 THEN
            (len(list_filter({_TOKS}, x -> lower(x) IN ({_SW}))) * 100 / len({_TOKS})) >= 10
          ELSE FALSE END AS is_en_pred
        FROM documents)
      SELECT doc_id, lang, is_en_pred, is_en_pred = (lang = 'en') AS agrees FROM q
    """,
    "doc_ngram_jaccard": f"""
      WITH {_SHINGLES},
      ex0 AS (
        SELECT doc_id AS id, len(shingles) AS sz, unnest(shingles) AS s
        FROM docs_sh),
      hot AS (SELECT s FROM ex0 GROUP BY s HAVING count(*) > 100),
      ex AS (SELECT * FROM ex0 WHERE s NOT IN (SELECT s FROM hot)),
      pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter,
               any_value(a.sz) AS size_a, any_value(b.sz) AS size_b
        FROM ex a JOIN ex b ON a.s = b.s AND a.id < b.id
        GROUP BY 1, 2)
      SELECT id_a, id_b, inter, size_a, size_b FROM pairs
      WHERE inter * 1.0 / (size_a + size_b - inter) >= 0.5
    """,
    "doc_dup_clusters": _CLUSTER_LAB + """
      SELECT doc_id, cluster_id,
             count(*) OVER (PARTITION BY cluster_id) AS cluster_size
      FROM lab
    """,
    "doc_split_dedup_safe": _CLUSTER_LAB + """
      SELECT doc_id, cluster_id,
             CASE WHEN (((cluster_id % 2147483647) * 2654435761) % 4294967296) % 1000 < 900
                  THEN 'train' ELSE 'heldout' END AS split
      FROM lab
    """,
    "doc_contamination": f"""
      WITH {_SHINGLES},
      bench AS (
        SELECT DISTINCT unnest(shingles) AS s FROM docs_sh WHERE doc_id % 37 = 0),
      corpus AS (
        SELECT doc_id, len(shingles) AS n_shingles FROM docs_sh WHERE doc_id % 37 <> 0),
      ex AS (
        SELECT doc_id, unnest(shingles) AS s FROM docs_sh WHERE doc_id % 37 <> 0),
      hits AS (
        SELECT ex.doc_id, count(*) AS n_cont
        FROM ex JOIN bench USING (s) GROUP BY 1)
      SELECT c.doc_id, c.n_shingles,
             CAST(coalesce(h.n_cont, 0) AS BIGINT) AS n_contaminated,
             c.n_shingles > 0 AND coalesce(h.n_cont, 0) * 100 >= c.n_shingles * 10
               AS flagged
      FROM corpus c LEFT JOIN hits h ON h.doc_id = c.doc_id
    """,
    "doc_repetition": f"""
      WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
      bg AS (
        SELECT doc_id,
          CASE WHEN len(toks) >= 2 THEN
            list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
          ELSE [] END AS bgs
        FROM t),
      ex AS (SELECT doc_id, unnest(bgs) AS b FROM bg),
      cnt AS (SELECT doc_id, b, count(*) AS c FROM ex GROUP BY 1, 2),
      agg AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
               count(*) AS n_distinct_bigrams, max(c) AS top_bigram_n,
               CAST(sum(c) - count(*) AS BIGINT) AS dup_bigram_n
        FROM cnt GROUP BY 1)
      SELECT t.doc_id,
             coalesce(a.n_bigrams, 0) AS n_bigrams,
             coalesce(a.n_distinct_bigrams, 0) AS n_distinct_bigrams,
             coalesce(a.top_bigram_n, 0) AS top_bigram_n,
             coalesce(a.dup_bigram_n, 0) AS dup_bigram_n,
             coalesce(a.n_bigrams, 0) > 0
               AND coalesce(a.dup_bigram_n, 0) * 5 >= coalesce(a.n_bigrams, 0)
               AS flagged
      FROM t LEFT JOIN agg a ON a.doc_id = t.doc_id
    """,
    "doc_pii_redact": f"""
      WITH d AS (
        SELECT doc_id, text
          || CASE WHEN doc_id % {_PII_HEADER_DOC} = 0
               THEN ' contact user' || doc_id || '@example.com' ELSE '' END
          || CASE WHEN doc_id % {_PII_IP_DOC} = 0
               THEN ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 100)
               ELSE '' END
          || CASE WHEN doc_id % {_PII_PHONE_DOC} = 0
               THEN ' call +1 555 01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' 99'
               ELSE '' END
          AS text
        FROM documents),
      n AS (
        SELECT doc_id, text,
          CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(text, '{PII_IP_RE}')) AS BIGINT) AS n_ips,
          CAST(len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones
        FROM d)
      SELECT doc_id, n_emails, n_ips, n_phones,
             (n_emails + n_ips + n_phones) > 0 AS has_pii,
             md5(regexp_replace(regexp_replace(regexp_replace(text,
                 '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{PII_IP_RE}', '<IP>', 'g'),
                 '{PII_PHONE_RE}', '<PHONE>', 'g')) AS red_fp
      FROM n
    """,
    "doc_quality_filter": f"""
      WITH base AS (
        SELECT doc_id,
          CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
          CAST(length(replace(text, ' ', '')) AS BIGINT) AS sum_tok_len,
          CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS BIGINT) AS n_punct,
          CAST(length(text) AS BIGINT) AS n_chars_q,
          CAST(len(list_filter({_TOKS}, x -> lower(x) IN ({_SW}))) AS BIGINT) AS n_stopwords
        FROM documents),
      t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
      bg AS (
        SELECT doc_id,
          CASE WHEN len(toks) >= 2 THEN
            list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
          ELSE [] END AS bgs
        FROM t),
      ex AS (SELECT doc_id, unnest(bgs) AS b FROM bg),
      cnt AS (SELECT doc_id, b, count(*) AS c FROM ex GROUP BY 1, 2),
      rep0 AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
               CAST(sum(c) - count(*) AS BIGINT) AS dup_bigram_n
        FROM cnt GROUP BY 1),
      j AS (
        SELECT b.*, coalesce(r.n_bigrams, 0) AS n_bigrams,
               coalesce(r.dup_bigram_n, 0) AS dup_bigram_n
        FROM base b LEFT JOIN rep0 r ON r.doc_id = b.doc_id),
      v AS (
        SELECT *,
          CAST(
            CASE WHEN NOT (n_tokens BETWEEN 5 AND 100000) THEN 1 ELSE 0 END
          + CASE WHEN NOT (sum_tok_len >= 3 * n_tokens
                           AND sum_tok_len <= 10 * n_tokens) THEN 2 ELSE 0 END
          + CASE WHEN n_punct * 10 >= n_chars_q THEN 4 ELSE 0 END
          + CASE WHEN n_stopwords < 2 THEN 8 ELSE 0 END
          + CASE WHEN n_bigrams > 0 AND dup_bigram_n * 5 >= n_bigrams
                 THEN 16 ELSE 0 END AS BIGINT) AS reasons
        FROM j)
      SELECT doc_id, n_tokens, sum_tok_len, n_punct, n_stopwords,
             n_bigrams, dup_bigram_n, reasons, reasons = 0 AS keep
      FROM v
    """,
    "doc_line_dedup": f"""
      WITH d AS (
        SELECT doc_id,
          ['{_LD_HEADER}']
          || list_transform(range(0, greatest((length(text) - 1) // {_LD_WIDTH}, 0) + 1),
                            i -> substr(text, i * {_LD_WIDTH} + 1, {_LD_WIDTH}))
          || CASE WHEN doc_id % {_LD_FOOTER_DOC} = 0
               THEN ['{_LD_FOOTER}'] ELSE [] END AS lines
        FROM documents),
      ex AS (
        SELECT doc_id, struct_extract(u, 'pos') AS pos,
               struct_extract(u, 'line') AS line
        FROM (
          SELECT doc_id, unnest(list_transform(range(0, len(lines)),
                 i -> struct_pack(pos := i, line := lines[i+1]))) AS u
          FROM d)),
      surv AS (
        SELECT line, min(struct_pack(doc_id := doc_id, pos := pos)) AS w
        FROM ex GROUP BY line),
      k AS (
        SELECT e.doc_id, e.pos, e.line,
               (struct_extract(s.w, 'doc_id') = e.doc_id
                AND struct_extract(s.w, 'pos') = e.pos) AS keep
        FROM ex e JOIN surv s ON s.line = e.line)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_lines,
             md5(coalesce(string_agg(CASE WHEN keep THEN line END,
                 chr(10) ORDER BY pos), '')) AS kept_fp
      FROM k GROUP BY doc_id
    """,
    "doc_stratified_sample": """
      WITH h AS (
        SELECT doc_id, lang, source,
               (((doc_id % 2147483647) * 2654435761) % 4294967296) % 1000 AS h_bucket
        FROM documents)
      SELECT doc_id, lang, source, h_bucket FROM h
      WHERE h_bucket < CASE lang WHEN 'en' THEN 400 WHEN 'zh' THEN 700
                       ELSE 1000 END
    """,
    "doc_pack_sequences": f"""
      WITH t AS (
        SELECT doc_id, doc_id % 8 AS shard, len({_TOKS}) AS n_tok
        FROM documents),
      s AS (
        SELECT doc_id, shard, n_tok,
               CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS start_off
        FROM t)
      SELECT doc_id, shard, n_tok, start_off,
             CAST(start_off // 256 AS BIGINT) AS pack_id,
             start_off % 256 AS pack_off
      FROM s
    """,
    "doc_incremental_dedup": """
      SELECT md5(text) AS fp, min(doc_id) AS keep_id
      FROM documents GROUP BY 1
    """,
    "doc_vocab_topk": f"""
      WITH t AS (
        SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
      a AS (
        SELECT tok, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
        FROM t GROUP BY 1)
      SELECT tok, n_occ, n_docs FROM a
      ORDER BY n_occ DESC, tok ASC LIMIT 200
    """,
    "doc_lm_score": f"""
      WITH t AS (
        SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
      c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY 1),
      b AS (SELECT tok, length(bin(cnt)) - 1 AS bits FROM c),
      d AS (
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
               CAST(sum(b.bits) AS BIGINT) AS sum_bits
        FROM t JOIN b USING (tok) GROUP BY 1),
      tot AS (
        SELECT CAST(sum(n_tok) AS BIGINT) AS tot_tok,
               CAST(sum(sum_bits) AS BIGINT) AS tot_bits
        FROM d)
      SELECT doc_id, n_tok, sum_bits,
        CASE WHEN sum_bits * tot_tok >= n_tok * tot_bits THEN 'head'
             WHEN sum_bits * tot_tok * 8 >= n_tok * tot_bits * 7 THEN 'middle'
             ELSE 'tail' END AS ppl_bucket
      FROM d CROSS JOIN tot
    """,
    "doc_mix_report": f"""
      WITH d AS (
        SELECT lang, len({_TOKS}) AS n_tok,
               CASE WHEN (((doc_id % 2147483647) * 2654435761) % 4294967296) % 1000 <
                 CASE lang WHEN 'en' THEN 400 WHEN 'zh' THEN 700
                 ELSE 1000 END
               THEN 1 ELSE 0 END AS kept
        FROM documents)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             CAST(sum(kept) AS BIGINT) AS n_docs_sampled,
             CAST(sum(kept * n_tok) AS BIGINT) AS n_tokens_sampled
      FROM d GROUP BY 1
    """,
    "doc_temp_mix": f"""
      WITH per AS (
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens,
               CAST(floor(sqrt(CAST(sum(len({_TOKS})) AS BIGINT))) AS BIGINT) AS s
        FROM documents GROUP BY 1),
      tot AS (
        SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
               CAST(sum(s) AS BIGINT) AS tot_s
        FROM per)
      SELECT lang, n_docs, n_tokens,
             CAST((1000000 * n_tokens) // tot_tokens AS BIGINT) AS raw_ppm,
             CAST((1000000 * s) // tot_s AS BIGINT) AS temp_ppm
      FROM per, tot
    """,
    "doc_bpe_tokens": r"""
      WITH t AS (
        SELECT doc_id,
          regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS toks
        FROM documents)
      SELECT doc_id, len(toks) AS n_bpe_tokens,
             len(list_filter(toks, x -> regexp_full_match(x, '[A-Za-z]+'))) AS n_word_tokens,
             len(list_distinct(toks)) AS n_unique_tokens
      FROM t
    """,
    "multimodal_frames": """
      WITH m AS (
        SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
      SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
             CAST(i * 64 AS INTEGER) AS frame_off,
             CAST(least(64, n - i * 64) AS INTEGER) AS frame_len
      FROM m, unnest(range(0, greatest(1, (n + 63) // 64))) AS u(i)
    """,
    "multimodal_decode": """
      SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
             CAST(octet_length(encode(text)) % 16 + 1 AS INTEGER) AS n_frames
      FROM documents
    """,
    "emb_dup_clusters": """
      WITH RECURSIVE base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      jp AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM base a JOIN base b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.4),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM jp
        UNION SELECT id_b, id_a FROM jp),
      reach(id, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
      comp AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
      lab AS (
        SELECT b.vec_id, coalesce(c.cluster_id, b.vec_id) AS cluster_id
        FROM base b LEFT JOIN comp c ON c.id = b.vec_id)
      SELECT vec_id, cluster_id,
             count(*) OVER (PARTITION BY cluster_id) AS cluster_size
      FROM lab
    """,
    "emb_near_dup": """
      WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM base a JOIN base b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.4
    """,
    "emb_cosine_topk": """
      WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      pairs AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS nbr,
               list_cosine_similarity(a.v, b.v) AS cos
        FROM base a JOIN base b ON a.vec_id <> b.vec_id),
      ranked AS (
        SELECT vec_id, nbr, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, nbr ASC) AS rank
        FROM pairs)
      SELECT vec_id, rank, nbr AS neighbor_id FROM ranked WHERE rank <= 3
    """,
}
