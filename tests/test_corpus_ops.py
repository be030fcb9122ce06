"""Corpus-assembly operators: contamination, repetition signals,
stratified sampling, sequence packing.

Reference analog: DM has no corpus ops (it replicates rows); these are
the training-pipeline extensions the rebuild adds on top, driven by the
same config-as-pipeline idea (dm/config/task.go:279-338). Oracle parity
runs in scripts/check_entry.py; these tests pin the edge-case laws the
synthetic corpus does not exercise."""

from __future__ import annotations

from pyspark.sql import functions as F

from dm_spark.functions.dedup import contamination_check
from dm_spark.functions.sampling import pack_sequences, sample_hash, stratified_sample
from dm_spark.functions.text import repetition_signals


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_contamination_flags_overlapping_doc(spark):
    bench = _docs(spark, [(0, "alpha beta gamma delta epsilon", "en")])
    corpus = _docs(
        spark,
        [
            (1, "alpha beta gamma delta zeta", "en"),  # 2 of 3 shingles shared
            (2, "one two three four five", "en"),  # disjoint
            (3, "xy", "en"),  # < k tokens: zero shingles, never flagged
        ],
    )
    out = {
        r["doc_id"]: r
        for r in contamination_check(corpus, bench, k=3, flag_pct=10).collect()
    }
    assert out[1]["n_shingles"] == 3 and out[1]["n_contaminated"] == 2
    assert out[1]["flagged"] is True
    assert out[2]["n_contaminated"] == 0 and out[2]["flagged"] is False
    assert out[3]["n_shingles"] == 0 and out[3]["flagged"] is False


def test_contamination_counts_distinct_shingles_once(spark):
    # the same shingle appearing in MANY benchmark docs still counts
    # once per corpus doc (the benchmark side is a distinct set)
    bench = _docs(
        spark, [(0, "a b c", "en"), (10, "a b c", "en"), (20, "a b c x", "en")]
    )
    corpus = _docs(spark, [(1, "a b c", "en")])
    row = contamination_check(corpus, bench, k=3).collect()[0]
    assert row["n_contaminated"] == 1


def test_repetition_signals_laws(spark):
    df = _docs(
        spark,
        [
            (1, "spam spam spam spam", "en"),  # bigrams: 3x "spam spam"
            (2, "a b c d", "en"),  # all distinct
            (3, "x", "en"),  # zero bigrams
        ],
    )
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    r1 = out[1]
    assert r1["n_bigrams"] == 3 and r1["n_distinct_bigrams"] == 1
    assert r1["top_bigram_n"] == 3 and r1["dup_bigram_n"] == 2
    assert r1["flagged"] is True  # 2*5 >= 3
    r2 = out[2]
    assert r2["n_bigrams"] == 3 and r2["dup_bigram_n"] == 0 and r2["flagged"] is False
    r3 = out[3]
    assert r3["n_bigrams"] == 0 and r3["flagged"] is False


def test_stratified_sample_deterministic_and_rate_bound(spark):
    rows = [(i, f"text {i}", "en" if i % 2 else "de") for i in range(2000)]
    df = _docs(spark, rows)
    out = stratified_sample(df, {"en": 250}, strat_col="lang")
    got = {(r["doc_id"]) for r in out.collect()}
    again = {(r["doc_id"]) for r in stratified_sample(df, {"en": 250}).collect()}
    assert got == again  # no RNG state anywhere
    en_total = sum(1 for i in range(2000) if i % 2)
    en_kept = sum(1 for i in got if i % 2)
    de_kept = sum(1 for i in got if not i % 2)
    assert de_kept == 1000  # default keep-all stratum
    # Knuth hash is near-uniform: 25% +- a generous band
    assert 0.18 * en_total < en_kept < 0.32 * en_total
    # membership law is exactly the hash bucket rule
    for i in list(got)[:50]:
        if i % 2:
            assert (((i % 2147483647) * 2654435761) % (1 << 32)) % 1000 < 250


def test_sample_hash_matches_python_law(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    rows = df.select("doc_id", sample_hash(F.col("doc_id")).alias("h")).collect()
    for r in rows:
        assert r["h"] == (((r["doc_id"] % 2147483647) * 2654435761) % (1 << 32)) % 1000


def test_normalized_dedup_collapses_near_copies(spark):
    """Canonical-form dedup must merge case/punctuation/whitespace
    variants that byte-exact dedup keeps apart (the synthetic corpus
    has none, so the law is pinned here)."""
    from dm_spark.functions.dedup import exact_dedup
    from dm_spark.functions.text import normalized_text

    df = _docs(
        spark,
        [
            (1, "Hello, World!  How are you?", "en"),
            (2, "hello world how are you", "en"),
            (3, "HELLO  WORLD. how ARE you", "en"),
            (4, "something else entirely", "en"),
        ],
    )
    byte_exact = exact_dedup(df).count()
    norm = exact_dedup(df.withColumn("text", normalized_text(F.col("text")))).collect()
    assert byte_exact == 4  # byte-exact sees 4 distinct docs
    assert len(norm) == 2  # canonical form collapses 1/2/3
    merged = next(r for r in norm if r["n_dupes"] == 3)
    assert merged["keep_id"] == 1


def test_conversation_fp_is_ingestion_order_invariant(spark):
    """The conversation fingerprint (md5 over turn_idx-ordered texts,
    q_conversation_assembly) must not depend on row arrival order —
    array_sort over (turn_idx, text) structs makes the concat total-
    ordered. Pin it against a hand-computed md5 on shuffled input."""
    import hashlib

    from pyspark.sql import functions as F

    turns = [("c1", i, f"turn number {i}") for i in range(20)]
    expected = hashlib.md5(
        "\n".join(t[2] for t in sorted(turns, key=lambda t: t[1])).encode()
    ).hexdigest()
    df = (
        spark.createDataFrame(
            list(reversed(turns)), "conv_id string, turn_idx int, text string"
        )
        .repartition(7)  # scramble physical order
    )
    got = (
        df.groupBy("conv_id")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                        lambda x: x["text"],
                    ),
                    "\n",
                )
            ).alias("fp")
        )
        .collect()[0]["fp"]
    )
    assert got == expected


def test_vocab_topk_boundary_is_totally_ordered(spark):
    """Top-k vocab with count ties crossing the k boundary: the
    (count DESC, token ASC) total order must pick the same set any
    engine would — pinned against a Python-computed reference (the
    31-token fixture corpus never exercises the boundary)."""
    from collections import Counter

    # 300 distinct tokens; tok_000..tok_299, token i appears (i // 100 + 1)
    # times -> large tie groups crossing k=200
    words = []
    for i in range(300):
        words += [f"tok_{i:03d}"] * (i // 100 + 1)
    df = _docs(spark, [(1, " ".join(words), "en")])
    from pyspark.sql import functions as F

    from dm_spark.functions.text import tokens

    ex = df.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    got = (
        ex.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .orderBy(F.col("n_occ").desc(), F.col("tok").asc())
        .limit(200)
        .collect()
    )
    counts = Counter(words)
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    assert [(r["tok"], r["n_occ"]) for r in got] == expect


def test_pack_sequences_invariants(spark):
    rows = [(i, " ".join(["tok"] * (7 + i % 90)), "en") for i in range(500)]
    df = _docs(spark, rows)
    out = pack_sequences(df, seq_len=64, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        assert r["shard"] == r["doc_id"] % 4
        assert r["pack_id"] == r["start_off"] // 64
        assert r["pack_off"] == r["start_off"] % 64
        by_shard.setdefault(r["shard"], []).append(r)
    for rows_ in by_shard.values():
        rows_.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rows_:  # contiguous concat stream: no gaps, no overlap
            assert r["start_off"] == off
            off += r["n_tok"]


def test_redact_pii_counts_and_replacement_order(spark):
    from dm_spark.functions.text import redact_pii

    df = _docs(
        spark,
        [
            (1, "mail me at jo.doe+x@sub.example.org or bob@x.io", "en"),
            (2, "server 192.168.0.1 and 10.0.0.255 up", "en"),
            (3, "call +44 20 7946 0958 today", "en"),
            # counts are INDEPENDENT per pattern (documented law): the
            # 10-digit run inside the email also counts phone-shaped,
            # but sequential redaction still consumes it as <EMAIL>
            (4, "user1234567890@example.com at 1.2.3.4", "en"),
            (5, "plain text no pii here", "en"),
        ],
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (2, 0, 0)
    assert out[1]["redacted"] == "mail me at <EMAIL> or <EMAIL>"
    assert (out[2]["n_ips"], out[2]["n_phones"]) == (2, 0)
    assert out[2]["redacted"] == "server <IP> and <IP> up"
    assert out[3]["n_phones"] == 1
    assert out[3]["redacted"] == "call <PHONE> today"
    assert (out[4]["n_emails"], out[4]["n_ips"], out[4]["n_phones"]) == (1, 1, 1)
    assert out[4]["redacted"] == "<EMAIL> at <IP>"
    assert out[5]["has_pii"] is False and out[5]["redacted"] == out[5]["text"]


def test_quality_filter_reason_bits(spark):
    from dm_spark.functions.text import (
        QF_FEW_STOPWORDS,
        QF_PUNCT_HEAVY,
        QF_REPETITIVE,
        QF_TOKENS_OUT_OF_RANGE,
        QF_WORDLEN_OUT_OF_RANGE,
        quality_filter,
    )

    df = _docs(
        spark,
        [
            # clean: 10 tokens, mean word length 4.3, 2 stopwords
            (1, "the quick brown fox jumps over the lazy sleeping dog", "en"),
            (2, "too short", "en"),  # <5 tokens, no stopwords x2? 'too short' 0 sw
            (3, "aaaaaaaaaaaaaaa bbbbbbbbbbbbbbbb cccccccccccc dddddddddddd eeeeeeeeeeee", "en"),
            (4, "the cat... sat;; on!! the... mat... the;; cat!!", "en"),
            (5, "the cat the cat the cat the cat the cat and a dog", "en"),
        ],
    )
    out = {r["doc_id"]: r for r in quality_filter(df).collect()}
    assert out[1]["reasons"] == 0 and out[1]["keep"] is True
    # doc 2: 2 tokens (<5) and zero stopwords
    assert out[2]["reasons"] & QF_TOKENS_OUT_OF_RANGE
    assert out[2]["reasons"] & QF_FEW_STOPWORDS
    # doc 3: 5 long tokens -> mean wordlen > 10, token count ok
    assert out[3]["reasons"] & QF_WORDLEN_OUT_OF_RANGE
    assert not out[3]["reasons"] & QF_TOKENS_OUT_OF_RANGE
    # doc 4: punctuation-heavy
    assert out[4]["reasons"] & QF_PUNCT_HEAVY
    # doc 5: 'the cat' repeated -> duplicated bigrams >= 20%
    assert out[5]["reasons"] & QF_REPETITIVE
    assert out[5]["keep"] is False


def test_line_dedup_first_occurrence_and_fp(spark):
    import hashlib

    from pyspark.sql import functions as F

    from dm_spark.functions.dedup import line_dedup

    rows = [
        (1, "header\nunique one\nfooter", "en"),
        (2, "header\nunique two\nfooter", "en"),
        (3, "header\nfooter", "en"),  # every line boilerplate
    ]
    df = _docs(spark, rows)
    out = {
        r["doc_id"]: r
        for r in line_dedup(df, F.split(F.col("text"), "\n")).collect()
    }
    # doc 1 is the first occurrence of header+footer: keeps everything
    assert (out[1]["n_lines"], out[1]["kept_lines"]) == (3, 3)
    assert out[1]["kept_fp"] == hashlib.md5(
        b"header\nunique one\nfooter"
    ).hexdigest()
    # doc 2 keeps only its unique middle line
    assert (out[2]["n_lines"], out[2]["kept_lines"]) == (3, 1)
    assert out[2]["kept_fp"] == hashlib.md5(b"unique two").hexdigest()
    # doc 3 loses every line -> md5 of empty string, not NULL
    assert (out[3]["n_lines"], out[3]["kept_lines"]) == (2, 0)
    assert out[3]["kept_fp"] == hashlib.md5(b"").hexdigest()


def test_convo_hygiene_edge_laws(spark):
    from dm_spark.queries_cdc import convo_hygiene

    fin = spark.createDataFrame(
        [
            # c1: clean user -> assistant -> tool
            ("c1", 1, "user"), ("c1", 2, "assistant"), ("c1", 3, "tool"),
            # c2: starts with assistant, adjacent repeat
            ("c2", 1, "assistant"), ("c2", 2, "assistant"), ("c2", 3, "user"),
            # c3: orphan tool at turn 1 AND tool-after-user
            ("c3", 1, "tool"), ("c3", 2, "user"), ("c3", 3, "tool"),
        ],
        "conv_id string, turn_idx int, role string",
    )
    out = {r["conv_id"]: r for r in convo_hygiene(fin).collect()}
    assert out["c1"]["valid"] is True and out["c1"]["n_orphan_tools"] == 0
    assert out["c2"]["starts_with_user"] is False
    assert out["c2"]["n_role_repeats"] == 1 and out["c2"]["valid"] is False
    assert out["c3"]["n_orphan_tools"] == 2 and out["c3"]["valid"] is False


def test_sft_examples_context_law(spark):
    import hashlib

    from dm_spark.queries_cdc import sft_examples

    fin = spark.createDataFrame(
        [
            # c1: assistant at turns 2 and 4 -> two examples; the
            # leading assistant in c2 has no context -> excluded
            ("c1", 1, "user", "hi there"),
            ("c1", 2, "assistant", "hello"),
            ("c1", 3, "tool", "result 42"),
            ("c1", 4, "assistant", "done ok"),
            ("c2", 1, "assistant", "cold open"),
            ("c2", 2, "user", "what"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {(r["conv_id"], r["turn_idx"]): r for r in sft_examples(fin).collect()}
    assert set(out) == {("c1", 2), ("c1", 4)}

    def fp(lines):
        return hashlib.md5("\n".join(lines).encode()).hexdigest()

    ex1 = out[("c1", 2)]
    assert ex1["ctx_turns"] == 1 and ex1["ctx_tokens"] == 2
    assert ex1["ctx_fp"] == fp(["user: hi there"])
    assert ex1["target_tokens"] == 1
    ex2 = out[("c1", 4)]
    assert ex2["ctx_turns"] == 3 and ex2["ctx_tokens"] == 5
    assert ex2["ctx_fp"] == fp(["user: hi there", "assistant: hello", "tool: result 42"])
    assert ex2["target_tokens"] == 2


def test_context_window_suffix_truncation_laws(spark):
    from dm_spark.queries_cdc import context_window_stats

    fin = spark.createDataFrame(
        [
            # c1: 3 turns x 5 tokens; budget 10 keeps exactly the last 2
            ("c1", 1, "a b c d e"),
            ("c1", 2, "a b c d e"),
            ("c1", 3, "a b c d e"),
            # c2: newest turn alone exceeds the budget -> nothing kept
            ("c2", 1, "x"),
            ("c2", 2, " ".join(["t"] * 11)),
            # c3: fits whole
            ("c3", 1, "a b"),
            ("c3", 2, "c"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    out = {r["conv_id"]: r for r in context_window_stats(fin, budget=10).collect()}
    assert out["c1"]["n_turns"] == 3
    assert out["c1"]["kept_turns"] == 2 and out["c1"]["kept_tokens"] == 10
    assert out["c1"]["first_kept_idx"] == 2  # exact-budget edge keeps
    assert out["c2"]["kept_turns"] == 0 and out["c2"]["kept_tokens"] == 0
    assert out["c2"]["first_kept_idx"] is None
    assert out["c3"]["kept_turns"] == 2 and out["c3"]["first_kept_idx"] == 1


def test_unigram_lm_bits_integer_law(spark):
    from dm_spark.functions.text import unigram_lm_bits

    # corpus counts: the=7 (bits 2), and=2 (bits 1), rare1/2/3=1 (bits 0)
    rows = [
        (1, "the the the the", "en"),
        (2, "and rare1", "en"),
        (3, "the the the and rare2 rare3", "en"),
    ]
    out = {r["doc_id"]: r for r in unigram_lm_bits(_docs(spark, rows)).collect()}
    assert (out[1]["n_tok"], out[1]["sum_bits"]) == (4, 8)
    assert (out[2]["n_tok"], out[2]["sum_bits"]) == (2, 1)
    assert (out[3]["n_tok"], out[3]["sum_bits"]) == (6, 7)
    # tot_tok=12, tot_bits=16: d1 mean 2 >= 4/3 -> head; d2 mean .5 -> tail;
    # d3 mean 7/6 sits EXACTLY on the 7/8-of-mean middle boundary
    # (84*8 == 96*7) — pins the >= edge of the bucket law
    assert out[1]["ppl_bucket"] == "head"
    assert out[2]["ppl_bucket"] == "tail"
    assert out[3]["ppl_bucket"] == "middle"


def test_unigram_lm_bits_drops_empty_docs(spark):
    from dm_spark.functions.text import unigram_lm_bits

    rows = [(1, "the the", "en"), (2, "", "en"), (3, "   ", "en")]
    out = unigram_lm_bits(_docs(spark, rows)).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_turn_dedup_first_occurrence_survivor(spark):
    import hashlib

    from dm_spark.queries_cdc import turn_dedup

    fin = spark.createDataFrame(
        [
            # boilerplate system turn repeated across conversations
            ("b", 1, "system", "hi"),
            ("a", 1, "system", "hi"),
            # same text repeated WITHIN one conversation: lowest turn wins
            ("c", 5, "user", "z"),
            ("c", 2, "user", "z"),
            # unique turn
            ("a", 2, "assistant", "ok"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    fp = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    out = {r["turn_fp"]: r for r in turn_dedup(fin).collect()}
    sys_row = out[fp("system:hi")]
    assert (sys_row["n_occ"], sys_row["keep_conv"], sys_row["keep_turn"]) == (2, "a", 1)
    z_row = out[fp("user:z")]
    assert (z_row["n_occ"], z_row["keep_conv"], z_row["keep_turn"]) == (2, "c", 2)
    ok_row = out[fp("assistant:ok")]
    assert (ok_row["n_occ"], ok_row["keep_conv"], ok_row["keep_turn"]) == (1, "a", 2)


def test_preference_pairs_laws(spark):
    """Pin the mining laws the sf fixtures exercise only in bulk:
    chosen = LWW winner, rejected = most recent DIFFERING superseded
    upsert (identical re-writes are skipped over), deleted-at-end and
    non-assistant keys emit nothing, and the binlog location breaks
    ts ties."""
    import datetime as dt

    from dm_spark.queries_cdc import preference_pairs

    t0 = dt.datetime(2026, 1, 1)
    ts = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    rows = [
        # (a,1): three differing versions -> pair (v3, v2), n=2
        ("a", 1, "I", "assistant", "v1", ts(1), 1, 1),
        ("a", 1, "U", "assistant", "v2", ts(2), 1, 2),
        ("a", 1, "U", "assistant", "v3", ts(3), 1, 3),
        # (a,2): final event is DELETE -> no pair
        ("a", 2, "I", "assistant", "x", ts(1), 1, 4),
        ("a", 2, "D", "assistant", "x", ts(2), 1, 5),
        # (a,3): final role is user -> no pair
        ("a", 3, "I", "user", "q1", ts(1), 1, 6),
        ("a", 3, "U", "user", "q2", ts(2), 1, 7),
        # (a,4): superseded text identical to chosen -> no pair
        ("a", 4, "I", "assistant", "same", ts(1), 1, 8),
        ("a", 4, "U", "assistant", "same", ts(2), 1, 9),
        # (a,5): identical rewrite BETWEEN chosen and the real
        # alternative: rejected skips over it to "m", n counts only
        # the differing version
        ("a", 5, "I", "assistant", "m", ts(1), 1, 10),
        ("a", 5, "U", "assistant", "n", ts(2), 1, 11),
        ("a", 5, "U", "assistant", "n", ts(3), 1, 12),
        # (a,6): ts tie -> pos decides the winner
        ("a", 6, "I", "assistant", "early", ts(1), 1, 13),
        ("a", 6, "U", "assistant", "late", ts(1), 1, 14),
    ]
    split = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, op string, role string, "
        "text string, ts timestamp, file_seq long, pos long",
    )
    out = {(r["conv_id"], r["turn_idx"]): r for r in preference_pairs(split).collect()}
    assert set(out) == {("a", 1), ("a", 5), ("a", 6)}
    assert (out[("a", 1)]["chosen"], out[("a", 1)]["rejected"]) == ("v3", "v2")
    assert out[("a", 1)]["n_superseded"] == 2
    assert (out[("a", 5)]["chosen"], out[("a", 5)]["rejected"]) == ("n", "m")
    assert out[("a", 5)]["n_superseded"] == 1
    assert (out[("a", 6)]["chosen"], out[("a", 6)]["rejected"]) == ("late", "early")


def test_prefix_templates_shared_depth_law(spark):
    """Two conversations sharing a digit-masked 2-turn prefix then
    diverging report shared_depth=2 with the depth-2 template
    fingerprint; an unrelated conversation is absent."""
    import hashlib

    from dm_spark.queries_cdc import prefix_templates

    fin = spark.createDataFrame(
        [
            ("p", 1, "user", "Hello 123"),
            ("p", 2, "assistant", "ack 9"),
            ("p", 3, "user", "bye"),
            ("q", 1, "user", "Hello 777"),  # masks to the same line as p's
            ("q", 2, "assistant", "ack 0"),
            ("q", 3, "user", "later"),
            ("r", 1, "user", "totally different"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {r["conv_id"]: r for r in prefix_templates(fin).collect()}
    assert set(out) == {"p", "q"}
    want_fp = hashlib.md5(b"user: Hello 0\nassistant: ack 0").hexdigest()
    for c in ("p", "q"):
        assert out[c]["shared_depth"] == 2
        assert out[c]["n_sharers"] == 2
        assert out[c]["template_fp"] == want_fp


def test_temp_mix_integer_law(spark):
    """alpha=0.5 smoothing as the exact isqrt/ppm integer law: a tail
    language's smoothed share strictly exceeds its raw share, and the
    ppm values match hand computation."""
    from dm_spark.queries_corpus import temp_mix

    big = " ".join(["w"] * 100)  # 100 tokens per doc
    docs = _docs(
        spark,
        [(i, big, "big") for i in range(4)] + [(99, "a b c d", "small")],
    )
    out = {r["lang"]: r for r in temp_mix(docs).collect()}
    # big: 400 tokens, s=20; small: 4 tokens, s=2; totals 404 / 22
    assert (out["big"]["n_tokens"], out["small"]["n_tokens"]) == (400, 4)
    assert out["big"]["raw_ppm"] == (1_000_000 * 400) // 404
    assert out["small"]["raw_ppm"] == (1_000_000 * 4) // 404
    assert out["big"]["temp_ppm"] == (1_000_000 * 20) // 22
    assert out["small"]["temp_ppm"] == (1_000_000 * 2) // 22
    assert out["small"]["temp_ppm"] > out["small"]["raw_ppm"]
    assert out["big"]["temp_ppm"] < out["big"]["raw_ppm"]


def test_tool_transitions_markov_law(spark):
    """Transitions are per-conversation ordered tool chains with a
    '<start>' marker; counts aggregate corpus-wide and n_convs counts
    distinct conversations exhibiting the transition. Non-tool turns
    never contribute."""
    from dm_spark.queries_cdc import tool_transitions

    fin = spark.createDataFrame(
        [
            ("x", 1, "tool", "a"),
            ("x", 2, "user", None),  # interleaved non-tool turn is invisible
            ("x", 3, "tool", "b"),
            ("x", 5, "tool", "a"),
            ("w", 1, "tool", "a"),
            ("w", 2, "tool", "b"),
            ("y", 2, "tool", "b"),
            ("z", 1, "user", None),  # no tool turns -> contributes nothing
        ],
        "conv_id string, turn_idx int, role string, tool string",
    )
    out = {
        (r["from_tool"], r["to_tool"]): (r["n"], r["n_convs"])
        for r in tool_transitions(fin).collect()
    }
    assert out == {
        ("<start>", "a"): (2, 2),  # x and w
        ("<start>", "b"): (1, 1),  # y
        ("a", "b"): (2, 2),  # x and w
        ("b", "a"): (1, 1),  # x only
    }


def test_dedup_safe_split_keeps_clusters_together(spark):
    """The leakage law: near-duplicates ALWAYS land on the same side of
    the split, even when their per-doc hashes would disagree — the
    split is keyed on the cluster id. Fixture ids are chosen so the
    naive per-doc split WOULD separate the pair."""
    from dm_spark.functions.sampling import sample_hash
    from dm_spark.queries_corpus import ngram_jaccard_pairs

    from dm_spark.functions.dedup import dup_clusters

    knuth = lambda i: (((i % 2147483647) * 2654435761) % 4294967296) % 1000  # noqa: E731
    # find a doc id whose own bucket is heldout (>=900) to pair with
    # doc 1 (bucket 653 < 900): the naive split separates them
    leak_id = next(i for i in range(2, 5000) if knuth(i) >= 900)
    assert knuth(1) < 900 <= knuth(leak_id)
    text = "alpha beta gamma delta epsilon zeta"
    docs = _docs(
        spark,
        [(1, text, "en"), (leak_id, text, "en"), (7, "one two three four five six", "en")],
    )
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, k=3)
    comp = dup_clusters(pairs).withColumnRenamed("id", "doc_id")
    lab = docs.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in lab.select(
            "doc_id",
            "cluster_id",
            F.when(sample_hash(F.col("cluster_id")) < 900, F.lit("train"))
            .otherwise(F.lit("heldout"))
            .alias("split"),
        ).collect()
    }
    # the near-dup pair shares cluster 1 and therefore the SAME side
    assert out[1] == (1, "train") and out[leak_id] == (1, "train")
    # the unrelated singleton splits by its own id
    assert out[7] == (7, "train" if knuth(7) < 900 else "heldout")


def test_sample_hash_overflow_safe_for_huge_ids(spark):
    """The folded Knuth law cannot overflow int64 for ANY bigint id —
    the unfolded form raised under Spark 4 ANSI (and overflowed
    DuckDB's BIGINT) above ~3.4e9 (review r5)."""
    from dm_spark.functions.sampling import sample_hash

    ids = [5_000_000_000, 2**62, 1, 999]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r["h"] for r in df.select("doc_id", sample_hash(F.col("doc_id")).alias("h")).collect()}
    law = lambda i: (((i % 2147483647) * 2654435761) % (1 << 32)) % 1000  # noqa: E731
    assert got == {i: law(i) for i in ids}


def test_best_of_history_argmax_laws(spark):
    """Pin the rejection-sampling mining laws: the winner is the
    version with the most DISTINCT whitespace tokens across the whole
    history (repetition collapses under the distinct count), score
    ties break toward the NEWEST version, deleted-at-end and
    non-assistant keys emit nothing, and best_is_lww=0 exactly where
    an older draft out-scores the LWW survivor."""
    import datetime as dt
    import hashlib

    from dm_spark.queries_cdc import best_of_history

    t0 = dt.datetime(2026, 1, 1)
    ts = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    rows = [
        # (a,1): the older draft has 3 distinct tokens, the final edit
        # repeats itself (2 distinct of 4) -> best is the OLD draft
        ("a", 1, "I", "assistant", "alpha beta gamma", ts(1), 1, 1),
        ("a", 1, "U", "assistant", "ok ok fine fine", ts(2), 1, 2),
        # (a,2): score tie (both 2 distinct) -> newest wins, is_lww=1
        ("a", 2, "I", "assistant", "x y", ts(1), 1, 3),
        ("a", 2, "U", "assistant", "p q", ts(2), 1, 4),
        # (a,3): deleted at end -> nothing
        ("a", 3, "I", "assistant", "gone", ts(1), 1, 5),
        ("a", 3, "D", "assistant", "gone", ts(2), 1, 6),
        # (a,4): final role user -> nothing
        ("a", 4, "I", "user", "question", ts(1), 1, 7),
        # (a,5): single version -> best IS the LWW row, n_versions=1
        ("a", 5, "I", "assistant", "only one here", ts(1), 1, 8),
    ]
    split = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, op string, role string, "
        "text string, ts timestamp, file_seq long, pos long",
    )
    out = {(r["conv_id"], r["turn_idx"]): r for r in best_of_history(split).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert set(out) == {("a", 1), ("a", 2), ("a", 5)}
    a1 = out[("a", 1)]
    assert (a1["best_score"], a1["n_versions"], a1["best_is_lww"]) == (3, 2, 0)
    assert a1["best_fp"] == md5("alpha beta gamma")
    a2 = out[("a", 2)]
    assert (a2["best_score"], a2["best_is_lww"]) == (2, 1)
    assert a2["best_fp"] == md5("p q")
    a5 = out[("a", 5)]
    assert (a5["n_versions"], a5["best_is_lww"]) == (1, 1)


def test_sft_loss_masks_span_geometry(spark):
    """Spans are half-open token offsets into the turn_idx-ordered
    'role: text' concatenation: contiguous (each start equals the
    previous end), first start is 0, widths equal the line token
    count (role prefix counts as one token), and loss_mask marks
    exactly the assistant turns."""
    from dm_spark.queries_cdc import sft_loss_masks

    fin = spark.createDataFrame(
        [
            ("c", 0, "user", "hi there"),          # 'user: hi there' = 3 tokens
            ("c", 1, "assistant", "hello"),         # 2 tokens
            ("c", 2, "tool", "a b c"),              # 4 tokens
            ("c", 3, "assistant", "done now ok"),   # 4 tokens
            ("d", 0, "user", "solo"),               # independent conversation
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {
        (r["conv_id"], r["turn_idx"]): (r["start_tok"], r["end_tok"], r["loss_mask"])
        for r in sft_loss_masks(fin).collect()
    }
    assert out[("c", 0)] == (0, 3, 0)
    assert out[("c", 1)] == (3, 5, 1)
    assert out[("c", 2)] == (5, 9, 0)
    assert out[("c", 3)] == (9, 13, 1)
    assert out[("d", 0)] == (0, 2, 0)


def test_conv_dedup_masked_collapse(spark):
    """Conversations identical up to digit runs collapse to the
    min-conv_id survivor; a differing text keeps its own cluster; the
    survivor's turn count rides along."""
    from dm_spark.queries_cdc import conv_dedup

    fin = spark.createDataFrame(
        [
            ("a", 0, "click #11"), ("a", 1, "buy #12"),
            ("b", 0, "click #99"), ("b", 1, "buy #7"),   # masked twin of a
            ("c", 0, "click #5"),  ("c", 1, "sell #5"),  # differs at turn 1
        ],
        "conv_id string, turn_idx int, text string",
    )
    out = {r["keep_conv"]: r for r in conv_dedup(fin).collect()}
    assert set(out) == {"a", "c"}
    assert (out["a"]["n_convs"], out["a"]["n_turns"]) == (2, 2)
    assert (out["c"]["n_convs"], out["c"]["n_turns"]) == (1, 2)


def test_conv_dedup_null_text_sentinel(spark):
    """NULL-text turns contribute a sentinel, never vanish: an all-NULL
    conversation gets a non-null fp DISTINCT from an empty-string
    conversation's, and a NULL mid-turn distinguishes from the same
    conversation without it (array_join's silent NULL-skip previously
    conflated all three AND diverged from the DuckDB twin's NULL
    string_agg; review r5)."""
    from dm_spark.queries_cdc import conv_dedup

    fin = spark.createDataFrame(
        [
            ("n", 0, None),
            ("e", 0, ""),
            ("m", 0, "hi"), ("m", 1, None), ("m", 2, "bye"),
            ("s", 0, "hi"), ("s", 1, "bye"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    out = {r["keep_conv"]: r["conv_fp"] for r in conv_dedup(fin).collect()}
    assert set(out) == {"n", "e", "m", "s"}  # four distinct clusters
    assert all(fp is not None for fp in out.values())
