"""Incremental MinHash-LSH index (functions.incremental.MinHashIndex):
kept-doc immutability, redelivery convergence, within-batch transitive
closure, shared banding law with the one-shot generator, and parameter
pinning. The streaming complement of minhash_lsh_pairs — the reference
analog is DM's per-batch causality closure (syncer/causality.go:60-92)
lifted to corpus dedup state."""

from __future__ import annotations

import pytest

from dm_spark.functions.incremental import MinHashIndex


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _flags(df):
    return {r["doc_id"]: (r["keep_id"], r["is_dup"]) for r in df.collect()}


LONG_A = "the quick brown fox jumps over the lazy dog near the old river bank " * 3
LONG_A2 = LONG_A.replace("lazy", "sleepy")  # one token off: Jaccard ~0.9
LONG_B = "entirely different content about spark shuffles and arrow batches " * 3


def test_minhash_index_fold_and_first_writer_wins(spark, tmp_path):
    idx = MinHashIndex.create(spark, str(tmp_path / "mh"), n_buckets=4)

    b1 = _flags(
        idx.fold(_docs(spark, [(10, LONG_A), (20, LONG_A), (30, LONG_B)]))
    )
    assert b1[10] == (10, False)  # within-batch min-id survivor
    assert b1[20] == (10, True)
    assert b1[30] == (30, False)
    assert idx.sigs.read().count() == 2  # only kept docs indexed

    # batch 2: a SMALLER id with near-dup content — the indexed keeper
    # holds (immutability), the newcomer is its dup; novel content keeps
    novel = "completely unrelated prose on lakes and manifests and buckets " * 3
    b2 = _flags(idx.fold(_docs(spark, [(1, LONG_A2), (40, novel)])))
    assert b2[1] == (10, True)  # NOT relabeled to keep_id 1
    assert b2[40][1] is False
    assert idx.sigs.read().count() == 3


def test_minhash_index_redelivery_converges(spark, tmp_path):
    idx = MinHashIndex.create(spark, str(tmp_path / "mh"), n_buckets=4)
    batch = _docs(spark, [(5, LONG_A), (6, LONG_A), (7, LONG_B)])
    first = _flags(idx.fold(batch))
    postings_n = idx.postings.read().count()
    replay = _flags(idx.fold(batch))
    assert replay == first  # identical flags on redelivery
    assert idx.postings.read().count() == postings_n  # no index growth
    assert idx.sigs.read().count() == 2


def test_minhash_index_within_batch_transitive_closure(spark, tmp_path):
    # A~B and B~C collide but A and C may not: the component min wins
    # for ALL three (dup_clusters closure inside the fold). One-token
    # hops (Jaccard ~0.7 each, ~0.45 across) with threshold 0.4 keep
    # each hop solidly above the cut under the seeded estimator.
    mid = LONG_A.replace("lazy", "sleepy")
    far = mid.replace("brown", "grey")
    idx = MinHashIndex.create(spark, str(tmp_path / "mh"), n_buckets=4)
    out = _flags(
        idx.fold(_docs(spark, [(3, far), (2, mid), (1, LONG_A)]), threshold=0.4)
    )
    assert out[1] == (1, False)
    assert out[2] == (1, True)
    assert out[3][1] is True  # pulled in transitively


def test_minhash_index_matches_one_shot_banding_law(spark, tmp_path):
    """A pair collides in the incremental index iff it collides in the
    one-shot generator: both bucket via dedup.banded_signature with the
    same pinned params, so the exact-dup decisions agree."""
    from dm_spark.functions.dedup import dup_clusters, minhash_lsh_pairs

    rows = [
        (1, LONG_A), (2, LONG_A), (3, LONG_B),
        (4, LONG_A2), (5, LONG_B + " tail"), (6, "short one-off text"),
    ]
    oneshot = dup_clusters(
        minhash_lsh_pairs(_docs(spark, rows), threshold=0.5)
    )
    global_dups = {
        r["id"]: r["cluster_id"] for r in oneshot.collect() if r["id"] != r["cluster_id"]
    }
    idx = MinHashIndex.create(spark, str(tmp_path / "mh"), n_buckets=4)
    inc = _flags(idx.fold(_docs(spark, rows), threshold=0.5))
    inc_dups = {i: k for i, (k, d) in inc.items() if d}
    assert inc_dups == global_dups


def test_minhash_index_indexed_signature_immutable(spark, tmp_path):
    """A doc_id already in the index stays kept AND its stored
    signature does not change, even if the id is redelivered with
    different content — decisions and index state are immutable
    (first-writer-wins on the id, same stance as the fingerprint
    index; a re-merge would race the stored sig on an equal-lineage
    LWW tie)."""
    idx = MinHashIndex.create(spark, str(tmp_path / "mh"), n_buckets=4)
    idx.fold(_docs(spark, [(5, LONG_A)]))
    sig_before = idx.sigs.read().collect()[0]["sig"]
    out = _flags(idx.fold(_docs(spark, [(5, LONG_B)])))  # same id, new text
    assert out[5] == (5, False)  # rule 1: stays kept
    rows = idx.sigs.read().collect()
    assert len(rows) == 1 and rows[0]["sig"] == sig_before


def test_minhash_index_streaming_fold(spark, tmp_path):
    """The index folds straight off a file stream (foreachBatch, one
    file per trigger): cross-batch near-dups resolve to the FIRST
    arrival (stream order, not min id), and a full redelivery through
    a fresh checkpoint leaves the index bit-identical — near-dup state
    maintained by the tail itself, not a separate batch job."""
    import os
    import time

    docs_dir = str(tmp_path / "docs")
    os.makedirs(docs_dir)
    files = [
        [(10, LONG_A), (11, LONG_B)],
        [(5, LONG_A2), (21, "a genuinely novel third document body " * 3)],
        [(30, LONG_B), (31, LONG_A)],
    ]
    for i, rows in enumerate(files):
        staging = str(tmp_path / f"stage-{i}")
        _docs(spark, rows).coalesce(1).write.parquet(staging)
        src = next(
            os.path.join(staging, n)
            for n in os.listdir(staging)
            if n.endswith(".parquet")
        )
        # flat files only (the file source does not recurse), admitted
        # by MODIFICATION TIME: stamp strictly increasing mtimes or
        # batch order scrambles
        dst = os.path.join(docs_dir, f"chunk-{i}.parquet")
        os.rename(src, dst)
        t = time.time() + i
        os.utime(dst, (t, t))

    idx = MinHashIndex.create(spark, str(tmp_path / "mh"), n_buckets=4)

    def run_stream(cp):
        q = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(docs_dir)
            .writeStream.foreachBatch(lambda bdf, bid: idx.fold(bdf))
            .option("checkpointLocation", str(tmp_path / cp))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(timeout=300)

    run_stream("cp1")
    kept = sorted(r["doc_id"] for r in idx.sigs.read().select("doc_id").collect())
    # 5 arrived AFTER 10: first-writer-wins keeps 10, not the min id
    assert kept == [10, 11, 21]
    postings_n = idx.postings.read().count()

    run_stream("cp2")  # fresh checkpoint = full redelivery
    kept2 = sorted(r["doc_id"] for r in idx.sigs.read().select("doc_id").collect())
    assert kept2 == kept
    assert idx.postings.read().count() == postings_n


def test_minhash_index_params_pinned(spark, tmp_path):
    root = str(tmp_path / "mh")
    MinHashIndex.create(spark, root, n_hashes=32, bands=8, k=4, seed=7)
    reopened = MinHashIndex(spark, root)
    assert reopened.params == {"n_hashes": 32, "bands": 8, "k": 4, "seed": 7}
    with pytest.raises(ValueError, match="bands must divide"):
        MinHashIndex.create(spark, str(tmp_path / "bad"), n_hashes=64, bands=7)
    # create() on an existing index refuses BEFORE touching params.json
    # — overwriting would silently re-bucket future folds into a space
    # incompatible with the stored signatures (review r5)
    with pytest.raises(FileExistsError, match="already exists"):
        MinHashIndex.create(spark, root, n_hashes=128)
    assert MinHashIndex(spark, root).params["n_hashes"] == 32  # unpoisoned
    # a clobbered params.json fails loudly on OPEN, not as silently
    # deflated estimates in a drifted bucket space
    import json

    with open(f"{root}/params.json", "w") as f:
        json.dump({"n_hashes": 32}, f)
    with pytest.raises(ValueError, match="corrupt"):
        MinHashIndex(spark, root)


def test_minhash_index_rejects_non_integral_ids(spark, tmp_path):
    """Index state is keyed bigint: a string id must fail fast with a
    clear TypeError, not a mid-merge ANSI cast error (or a NULL-key
    sigs collapse with ANSI off; review r5)."""
    idx = MinHashIndex.create(spark, str(tmp_path / "mh"), n_buckets=4)
    bad = spark.createDataFrame([("a", "text")], "doc_id string, text string")
    with pytest.raises(TypeError, match="integral"):
        idx.fold(bad)
