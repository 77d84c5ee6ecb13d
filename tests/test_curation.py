"""Corpus-curation operator tests: decontamination, shared spans,
repetition, PII/blocklist redaction, Gopher-style rule flags."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_example_spark.operators import curation


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # 0 and 1 share an 8-gram span ("alpha beta ... theta")
        (0, "alpha beta gamma delta epsilon zeta eta theta unique tail zero"),
        (1, "prefix one alpha beta gamma delta epsilon zeta eta theta"),
        # 2: heavy within-doc repetition
        (2, "spam spam spam spam spam spam spam spam spam spam"),
        # 3: too short for 8-grams
        (3, "tiny doc"),
        # 4: disjoint content
        (4, "the quick brown fox jumps over the lazy dog again today"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exploded_word_ngrams_counts(spark, corpus):
    g = curation.exploded_word_ngrams(corpus, n=8)
    counts = {r["doc_id"]: r["n"] for r in g.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    # len(words) - 8 + 1 n-grams; doc 3 (2 words) absent
    assert counts == {0: 4, 1: 3, 2: 3, 4: 4}
    first = (
        g.filter(F.col("doc_id") == 0)
        .orderBy("__g")
        .first()["__g"]
    )
    assert len(first.split(" ")) == 8


def test_decontaminate_flags_overlap(spark, corpus):
    bench = corpus.filter(F.col("doc_id") == 0)
    rest = corpus.filter(F.col("doc_id") != 0)
    out = curation.decontaminate(rest, bench, n=8).collect()
    # only doc 1 shares an 8-gram with the benchmark doc
    assert {(r["doc_id"], r["n_contaminated"]) for r in out} == {(1, 1)}


def test_shared_spans_cross_doc(spark, corpus):
    out = curation.shared_spans(corpus, n=8, min_docs=2).collect()
    spans = {r["span"]: (r["n_docs"], r["n_occurrences"]) for r in out}
    assert spans == {"alpha beta gamma delta epsilon zeta eta theta": (2, 2)}


def test_repetition_stats(spark, corpus):
    out = {r["doc_id"]: r for r in curation.repetition_stats(corpus, n=2).collect()}
    # doc 2: nine 2-grams, all identical
    assert out[2]["n_ngrams"] == 9 and out[2]["n_distinct"] == 1
    assert out[2]["rep_ratio"] == pytest.approx(1 - 1 / 9)
    # doc 4 repeats "the" but no 2-gram; fully distinct
    assert out[4]["rep_ratio"] == 0.0
    # doc 3 (2 words) has exactly one 2-gram
    assert out[3]["n_ngrams"] == 1 and out[3]["n_distinct"] == 1


def test_pii_redaction_real_patterns(spark):
    rows = [
        (0, "contact me at jane.doe+x@example.co.uk or +1 (555) 123-4567 ok"),
        (1, "no pii here"),
        (2, "two mails a@b.io c@d.org"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    emails = curation.redaction_stats(df, curation.EMAIL_PATTERN, "[EMAIL]")
    got = {r["doc_id"]: r["n_redactions"] for r in emails.collect()}
    assert got == {0: 1, 1: 0, 2: 2}
    redacted = df.select(
        "doc_id", curation.regex_redact(F.col("text"), curation.EMAIL_PATTERN, "[EMAIL]").alias("t")
    )
    t0 = {r["doc_id"]: r["t"] for r in redacted.collect()}
    assert t0[2] == "two mails [EMAIL] [EMAIL]"
    phones = curation.redaction_stats(df, curation.PHONE_PATTERN, "[PHONE]")
    assert {r["doc_id"]: r["n_redactions"] for r in phones.collect()}[0] == 1


def test_hash_sample_deterministic_and_proportional(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    a = curation.hash_sample(df, 0.3).count()
    b = curation.hash_sample(df, 0.3).count()
    assert a == b  # deterministic — same rows every run
    assert 0.25 * 10_000 < a < 0.35 * 10_000  # ~proportional
    # monotone: a larger fraction strictly contains the smaller sample
    small = {r["doc_id"] for r in curation.hash_sample(df, 0.1).collect()}
    big = {r["doc_id"] for r in curation.hash_sample(df, 0.5).collect()}
    assert small <= big


def test_stratified_sample_drops_unlisted_strata(spark):
    rows = [(i, "en" if i % 2 == 0 else "zz") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = curation.stratified_sample(df, {"en": 1.0})
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    assert out.count() == 500  # fraction 1.0 keeps every en row


def test_shard_stats_cover_all_docs(spark):
    df = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(500)], ["doc_id", "text"]
    )
    stats = curation.shard_stats(df, n_shards=8).collect()
    assert sum(r["n_docs"] for r in stats) == 500
    assert {r["shard"] for r in stats} <= set(range(8))
    # hash sharding balances within a loose band at this size
    counts = [r["n_docs"] for r in stats]
    assert max(counts) < 3 * min(counts)


def test_gopher_flags(spark, corpus):
    out = {r["doc_id"]: r for r in curation.gopher_flags(corpus).collect()}
    # doc 3 ("tiny doc") fails the min-token rule
    assert not out[3]["r_min_tokens"] and not out[3]["passes"]
    # doc 4 has English stopwords and sane shape but only 11 tokens
    assert out[4]["r_stopword"] and not out[4]["r_min_tokens"]
    # every flag column is boolean and passes == conjunction
    for r in out.values():
        conj = (
            r["r_min_tokens"]
            and r["r_max_tokens"]
            and r["r_word_len"]
            and r["r_alpha"]
            and r["r_stopword"]
        )
        assert r["passes"] == conj


def test_domain_cap_two_phase_matches_direct(spark):
    """Skew-safe two-phase cap == direct per-domain top-k, and a hot domain
    is actually capped."""
    from pyspark.sql import Window

    rows = [(i, "hot" if i < 40 else f"d{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    capped = curation.domain_cap(df, cap=5, n_salt=4)
    counts = {r["source"]: r["n"] for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["hot"] == 5
    assert all(v <= 5 for v in counts.values())
    # exactness vs the single-window reference
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    direct = df.withColumn("r", F.row_number().over(w)).filter("r <= 5").drop("r")
    assert sorted(r["doc_id"] for r in capped.collect()) == sorted(
        r["doc_id"] for r in direct.collect()
    )


def test_curated_corpus_composition(spark):
    """The composed pipeline equals applying the stages one by one."""
    from flink_example_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = curation.curated_corpus(docs)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows, "pipeline produced no survivors"
    # survivors are non-benchmark, dedup keepers, uncontaminated, passing
    bench = docs.filter("doc_id % 7 = 0")
    corpus = docs.filter("doc_id % 7 != 0")
    keepers = {
        r["doc_id"]
        for r in corpus.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    }
    contaminated = {
        r["doc_id"] for r in curation.decontaminate(corpus, bench).collect()
    }
    passing = {
        r["doc_id"] for r in curation.gopher_flags(corpus).filter("passes").collect()
    }
    expected = (keepers - contaminated) & passing
    assert set(rows) == expected
    assert all(0 <= r["shard"] < 8 for r in rows.values())


def test_shared_spans_hashed_matches_exact(spark, corpus):
    """The xxhash64 shuffle-diet path resolves to the identical relation."""
    exact = {tuple(r) for r in curation.shared_spans(corpus, n=8, min_docs=2).collect()}
    hashed = {
        tuple(r)
        for r in curation.shared_spans(corpus, n=8, min_docs=2, hashed=True).collect()
    }
    assert exact == hashed and exact


def test_decontaminate_hashed_matches_exact(spark, corpus):
    bench = corpus.filter(F.col("doc_id") == 0)
    rest = corpus.filter(F.col("doc_id") != 0)
    exact = {tuple(r) for r in curation.decontaminate(rest, bench, n=8).collect()}
    hashed = {
        tuple(r) for r in curation.decontaminate(rest, bench, n=8, hashed=True).collect()
    }
    assert exact == hashed and exact


def test_bloom_decontaminate_supersets_exact(spark, corpus):
    """Bloom flags every truly-contaminated doc with count >= the exact
    count (no false negatives, by construction); with a large filter and
    this tiny corpus there are no false positives either."""
    bench = corpus.filter(F.col("doc_id") == 0)
    rest = corpus.filter(F.col("doc_id") != 0)
    exact = {r["doc_id"]: r["n_contaminated"] for r in
             curation.decontaminate(rest, bench, n=8).collect()}
    bloom = {r["doc_id"]: r["n_flagged"] for r in
             curation.bloom_decontaminate(rest, bench, n=8, m=1 << 20, k=4).collect()}
    for doc, n in exact.items():
        assert bloom.get(doc, 0) >= n
    assert bloom == exact  # tiny corpus, 2^20 bits: fp-free


def test_ngram_bloom_shards_merge_by_bit_or(spark, corpus):
    """Bitmaps of disjoint shards OR together into the whole-corpus bitmap
    (the merge property that lets the filter build incrementally)."""
    whole = {r["word_idx"]: r["bits"] for r in curation.ngram_bloom(corpus, n=8).collect()}
    a = curation.ngram_bloom(corpus.filter(F.col("doc_id") % 2 == 0), n=8)
    b = curation.ngram_bloom(corpus.filter(F.col("doc_id") % 2 == 1), n=8)
    merged: dict[int, int] = {}
    for r in a.unionByName(b).collect():
        merged[r["word_idx"]] = merged.get(r["word_idx"], 0) | r["bits"]
    assert merged == whole


def test_remove_shared_spans_surgery(spark, corpus):
    out = {r["doc_id"]: r for r in curation.remove_shared_spans(corpus, n=8, min_docs=2).collect()}
    assert len(out) == 5  # one row per doc, always
    span = "alpha beta gamma delta epsilon zeta eta theta"
    # the shared span is excised from BOTH docs; unique content survives
    assert out[0]["clean_text"] == "unique tail zero"
    assert out[1]["clean_text"] == "prefix one"
    assert out[0]["n_tokens_removed"] == 8 and out[1]["n_tokens_removed"] == 8
    for d in (2, 3, 4):  # untouched docs pass through whitespace-normalized
        assert out[d]["n_tokens_removed"] == 0
        assert span not in out[d]["clean_text"]
    assert out[4]["clean_text"] == "the quick brown fox jumps over the lazy dog again today"


def test_pack_sequences_contiguous_offsets(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (5 + i % 7))) for i in range(40)] + [(99, "   ")],
        ["doc_id", "text"],
    )
    rows = curation.pack_sequences(docs, ctx_len=16, n_shards=4).collect()
    assert {r["doc_id"] for r in rows} == set(range(40))  # blank doc excluded
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["doc_id"])
        expect_start = 0
        for r in shard_rows:
            assert r["start_tok"] == expect_start
            assert r["first_bin"] == r["start_tok"] // 16
            assert r["last_bin"] == (r["start_tok"] + r["n_tok"] - 1) // 16
            assert r["n_bins"] == r["last_bin"] - r["first_bin"] + 1
            expect_start += r["n_tok"]


def test_chunk_tokens_covers_and_reconstructs(spark):
    text = " ".join(f"w{i}" for i in range(1, 101))  # 100 tokens
    docs = spark.createDataFrame([(1, text), (2, "short doc")], ["doc_id", "text"])
    rows = sorted(
        curation.chunk_tokens(docs, chunk_len=32, overlap=8).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    one = [r for r in rows if r["doc_id"] == 1]
    assert [r["start_tok"] for r in one] == [1, 25, 49, 73]
    assert [r["n_chunk_tokens"] for r in one] == [32, 32, 32, 28]
    # stride-concatenation (drop the 8-token overlap after the first chunk)
    rebuilt = one[0]["chunk_text"].split()
    for r in one[1:]:
        rebuilt.extend(r["chunk_text"].split()[8:])
    assert " ".join(rebuilt) == text
    two = [r for r in rows if r["doc_id"] == 2]
    assert len(two) == 1 and two[0]["chunk_text"] == "short doc"


def test_temperature_mix_rebalances_toward_small_domains(spark):
    """alpha=0.5 mixing: keep rates scale ~ 1/sqrt(n_d), so the head
    domain's keep FRACTION is strictly below the tail domain's; total lands
    near the target; the filter is deterministic (same rows twice)."""
    from flink_example_spark.operators.curation import temperature_mix

    rows = [(i, "head") for i in range(2000)] + [(i + 10_000, "tail") for i in range(125)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = temperature_mix(df, target_total=500)
    kept = out.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in kept}
    # rates: s_head=sqrt(2000)~44.7, s_tail~11.2 -> head thresh ~ 500*0.8/2000=20%,
    # tail ~ 500*0.2/125=80% (clamped at 100%)
    assert by["head"] / 2000 < by["tail"] / 125
    total = sum(by.values())
    assert abs(total - 500) / 500 < 0.2
    again = temperature_mix(df, target_total=500)
    assert {r["doc_id"] for r in out.collect()} == {r["doc_id"] for r in again.collect()}


def test_temperature_mix_small_domain_clamp(spark):
    """A domain whose computed rate exceeds 1 keeps every row."""
    from flink_example_spark.operators.curation import temperature_mix

    rows = [(i, "big") for i in range(5000)] + [(i + 10_000, "tiny") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = temperature_mix(df, target_total=1000)
    tiny_kept = out.filter(F.col("source") == "tiny").count()
    assert tiny_kept == 5


def test_drift_chi2_identical_halves_zero(spark):
    """Drift of a corpus against itself is exactly zero in every bucket."""
    from flink_example_spark.operators.curation import drift_chi2

    df = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 * 60 + 30).alias("n_chars")
    )
    out = drift_chi2(df, df).collect()
    assert len(out) > 1
    assert all(r["chi2_q6"] == 0 for r in out)


def test_drift_chi2_flags_shifted_distribution(spark):
    """A shifted current distribution produces large contributions, and a
    current-only bucket surfaces as a null-contrib row."""
    from flink_example_spark.operators.curation import drift_chi2

    ref = spark.range(100).select(F.lit(100).alias("n_chars"))
    cur = spark.range(100).select(
        F.when(F.col("id") < 50, 100).otherwise(900).alias("n_chars")
    )
    out = {r["bucket_lo"]: r for r in drift_chi2(ref, cur).collect()}
    assert out[100]["chi2_q6"] > 0          # mass moved away
    assert out[900]["chi2_q6"] is None      # bucket with no reference mass
    assert out[900]["n_cur"] == 50 and out[900]["n_ref"] == 0


def test_rrf_fusion_properties(spark):
    """RRF: a doc ranked well by both systems beats single-system docs;
    ranks are dense 1..k."""
    from flink_example_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id long, neighbor_id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2), (0, 12, 3)], "query_id long, neighbor_id long, rank int"
    )
    out = sorted(rrf_fuse(a, b, k=4).collect(), key=lambda r: r["fused_rank"])
    # doc 11: 1/62 + 1/61 wins over doc 10 (1/61) and doc 12 (2/63)
    assert [r["neighbor_id"] for r in out] == [11, 12, 10, 13]
    assert [r["fused_rank"] for r in out] == [1, 2, 3, 4]


def test_systematic_sample_properties(spark):
    from flink_example_spark.operators.curation import systematic_sample

    rows = [(i, 10) for i in range(200)] + [(999, 5000)]  # one heavy row
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = systematic_sample(df, k=20, weight_col="n")
    ids = sorted(r["doc_id"] for r in out.collect())
    # <= k rows; the heavy row (w > W/k = 350) is ALWAYS selected
    assert 0 < len(ids) <= 20
    assert 999 in ids
    # deterministic: identical selection on re-run
    ids2 = sorted(r["doc_id"] for r in systematic_sample(df, 20, "n").collect())
    assert ids == ids2
    assert out.columns == ["doc_id", "n"]


def test_systematic_sample_zero_weights_never_selected(spark):
    rows = [(i, 7) for i in range(50)] + [(1000 + i, 0) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    from flink_example_spark.operators.curation import systematic_sample

    ids = [r["doc_id"] for r in systematic_sample(df, k=10, weight_col="n").collect()]
    assert len(ids) == 10
    assert all(i < 1000 for i in ids)


def test_systematic_sample_all_zero_weights(spark):
    from flink_example_spark.operators.curation import systematic_sample

    df = spark.createDataFrame([(i, 0) for i in range(20)], "doc_id long, n long")
    assert systematic_sample(df, k=5, weight_col="n").count() == 0


def test_dsir_weights_steer_toward_target(spark):
    """Importance weights must rank target-like docs above the rest — the
    selection property DSIR exists for. The harness corpus shares one
    vocabulary across langs (quantized ratios collapse), so the steering
    property is pinned on a crafted two-vocabulary fixture."""
    from pyspark.sql import functions as F

    from flink_example_spark.operators.curation import dsir_weights

    target_text = "alpha beta gamma delta alpha beta"
    raw_text = "omega psi chi phi omega psi"
    rows = (
        [(i, target_text, True) for i in range(8)]
        + [(100 + i, raw_text, False) for i in range(8)]
        # held-out docs: 200s look like target, 300s look like raw
        + [(200, "alpha beta gamma", False), (300, "omega psi chi", False)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    w = dsir_weights(docs, target_pred=F.col("is_t"))
    got = {r["doc_id"]: r["avg_logratio_bits"] for r in w.collect()}
    assert got[200] > got[300]
    assert min(got[i] for i in range(8)) > max(got[100 + i] for i in range(8))


def test_quality_checks_detect_violations(spark):
    """Planted violations: a null key, a range breach, a duplicate id, and
    an orphaned FK must each surface with exact counts."""
    from pyspark.sql import functions as F

    from flink_example_spark.operators.quality import (
        expect,
        fk_orphans,
        unique_violations,
    )

    df = spark.createDataFrame(
        [(1, 5), (2, -3), (None, 7), (2, 9)], "id long, v long"
    )
    exp = {
        r["check"]: (r["n_violations"], r["passed"])
        for r in expect(
            df, [("id_not_null", F.col("id").isNotNull()), ("v_nonneg", F.col("v") >= 0)]
        ).collect()
    }
    assert exp == {"id_not_null": (1, False), "v_nonneg": (1, False)}
    u = unique_violations(df, ["id"]).collect()[0]
    assert (u["n_rows"], u["n_violations"], u["passed"]) == (4, 2, False)
    parent = spark.createDataFrame([(1,), (2,)], "id long")
    fk = fk_orphans(df, parent, "id", "id", "child->parent").collect()[0]
    # the NULL id and no other orphans: 1 violation
    assert (fk["n_rows"], fk["n_violations"], fk["passed"]) == (4, 1, False)


def test_greedy_coverage_lazy_batching_matches_naive_greedy(spark):
    """VERDICT-r10 task 7: the lazy-submodular batch keeps EXACT greedy
    semantics. Overlap-heavy 30-doc fixture (unigram sets, deterministic)
    where batched local picks must survive the certificate-failure path
    (ties and collapsing marginal gains): the picks equal a naive
    one-at-a-time Python greedy under the (gain desc, doc_id asc)
    tie-break, and the distributed-round counter records the round-trip
    reduction (< number of picks)."""
    from flink_example_spark.operators.curation import greedy_coverage

    # deterministic overlapping unigram sets: doc i holds words
    # {(i*7 + j*j) % 41 for j in range(3 + i % 9)} — heavy collisions
    docs = []
    sets = {}
    for i in range(1, 31):
        words = sorted({(i * 7 + j * j) % 41 for j in range(3 + i % 9)})
        sets[i] = {f"w{w}" for w in words}
        docs.append((i, " ".join(f"w{w}" for w in words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # naive exact greedy reference
    k = 20
    covered: set = set()
    expect = []
    tot = 0
    for r in range(1, k + 1):
        best_d, best_gain = None, 0
        for d in sorted(sets):
            g = len(sets[d] - covered)
            if g > best_gain:
                best_d, best_gain = d, g
        if best_d is None:
            break
        tot += best_gain
        expect.append((r, best_d, best_gain, tot))
        covered |= sets[best_d]

    stats: dict = {}
    got = sorted(
        tuple(r) for r in greedy_coverage(df, k=k, n=1, stats=stats).collect()
    )
    assert got == expect
    n_rounds = stats["distributed_rounds"]
    assert n_rounds < len(expect), (n_rounds, len(expect))
