"""Kernel-law tests for the vectorized MinHash / SimHash paths.

The driver's correctness gate records these queries as rows-only (the
hash laws aren't ANSI-SQL-expressible), so the math is pinned here:
- MinHash signatures equal a slow pure-Python reference of the SAME law
  (xxhash64 shingles -> 32-bit fold -> (a*x+b) mod M61 -> min).
- SimHash banding has recall 1.0 at the guaranteed Hamming bound vs an
  exact bit_count(xor) self-join (pigeonhole: max_hamming+1 bands).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dm_spark.functions.dedup import (
    MERSENNE,
    hashed_shingles,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash64,
    simhash_near_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river shore"),
    (3, "completely different text with no overlap whatsoever in any shingle"),
    (4, ""),  # empty -> empty shingle set
    (5, "one two"),  # below k=3 -> empty shingle set
    (6, "the quick brown fox jumps over the lazy dog near the river bank"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _reference_sig(hs: list[int], n_hashes: int = 64, seed: int = 42) -> list[int]:
    """Slow pure-Python twin of the minhash_signatures law."""
    rng = np.random.RandomState(seed)
    A = rng.randint(1, 1 << 31, size=n_hashes, dtype=np.uint64)
    B = rng.randint(0, MERSENNE, size=n_hashes, dtype=np.uint64)
    if not hs:
        return [MERSENNE] * n_hashes
    out = []
    for a, b in zip(A.tolist(), B.tolist()):
        best = MERSENNE
        for h in hs:
            u = h & 0xFFFFFFFFFFFFFFFF  # two's complement view
            x32 = (u ^ (u >> 32)) & 0xFFFFFFFF
            v = (a * x32 + b) % MERSENNE
            best = min(best, v)
        out.append(best)
    return out


def test_minhash_matches_reference_law(spark):
    df = _docs_df(spark)
    hs = {r.id: list(r.hs) for r in hashed_shingles(df).collect()}
    sigs = {r.id: list(r.sig) for r in minhash_signatures(df).collect()}
    assert set(sigs) == {1, 2, 3, 4, 5, 6}
    for did, sig in sigs.items():
        ref = _reference_sig(hs[did])
        got = [s & 0xFFFFFFFFFFFFFFFF for s in sig]  # signed -> unsigned
        assert got == ref, f"doc {did} kernel != reference law"
    # identical docs -> identical signatures; near-dups share many slots
    assert sigs[1] == sigs[6]
    shared = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    assert shared >= 32, shared  # jaccard ~0.66 -> expect ~2/3 of 64


def test_minhash_lsh_finds_near_dups(spark):
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(_docs_df(spark), threshold=0.5).collect()
    }
    assert (1, 6) in pairs  # exact dup
    assert (1, 2) in pairs  # near dup above threshold
    assert all(3 not in p and 4 not in p and 5 not in p for p in pairs)


def test_simhash_recall_at_hamming_bound(spark, sf_dir):
    """Banding must generate EVERY pair within max_hamming (recall 1.0):
    compare against the exact bit_count(xor) all-pairs join on sf0.001
    documents."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = simhash64(docs).cache()
    try:
        exact = {
            (r.id_a, r.id_b)
            for r in sig.alias("x")
            .join(sig.alias("y"), F.col("x.id") < F.col("y.id"))
            .where(
                F.bit_count(
                    F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
                )
                <= 8
            )
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .collect()
        }
        banded = {
            (r.id_a, r.id_b)
            for r in simhash_near_pairs(docs, max_hamming=8).collect()
        }
    finally:
        sig.unpersist()
    assert exact, "fixture produced no hamming<=8 pairs; weaken the bound"
    assert banded == exact  # recall AND precision 1.0 (verify step)


def test_ngram_jaccard_max_df_bounds_hot_shingle(spark):
    """Skew fixture: 40 docs share one stop-shingle ('terms of service')
    but are otherwise disjoint. Unguarded, the self-join fans out to
    C(40,2)=780 candidate pairs on that single key; with max_df the hot
    shingle is dropped and no candidates form — the guard that keeps the
    join linear at 100 TB."""
    from dm_spark.functions.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, f"terms of service unique{i} body{i} tail{i}") for i in range(40)],
        "doc_id long, text string",
    )
    unguarded = ngram_jaccard_pairs(docs, threshold=0.01, k=3, max_df=None)
    assert unguarded.count() == 780  # quadratic blowup on the hot key
    guarded = ngram_jaccard_pairs(docs, threshold=0.01, k=3, max_df=10)
    assert guarded.count() == 0


def test_simhash_empty_and_identical(spark):
    out = {r.id: r.simhash for r in simhash64(_docs_df(spark)).collect()}
    assert out[4] == 0 and out[5] == 0
    assert out[1] == out[6] != 0


def test_dup_clusters_transitive_closure(spark):
    """Pair graph -> connected components with min-id labels: a
    diameter-7 chain (exercises pointer jumping past one-hop
    propagation), a triangle clique, a lone pair, and the empty
    graph. A~B, B~C must collapse A,B,C even though A~C was never
    emitted."""
    from dm_spark.functions.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)]
        + [(10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = sorted((r.id, r.cluster_id) for r in dup_clusters(pairs).collect())
    assert got == (
        [(i, 1) for i in range(1, 9)]
        + [(10, 10), (11, 10), (12, 10), (20, 20), (21, 20)]
    )
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert dup_clusters(empty).collect() == []
