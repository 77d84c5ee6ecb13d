"""Text analysis operators for large-scale training-data pipelines.

All hot-path logic is JVM-side Catalyst expressions (split/regexp/array
functions) — no Python UDFs — so the same pipeline runs unchanged on a
1000-executor cluster with whole-stage codegen. Each operator has a DuckDB
oracle template (TEXT_ORACLES) built from the *same* definition so the
driver's t2 gate hash-matches.

Operators:
- token_count        whitespace tokenization count
- fingerprint        document fingerprint: md5 over normalized text
- lang_id            stopword-overlap language heuristic
- quality_score      length/alpha-ratio/stopword-ratio composite
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_example_spark.operators.util import spread

# Tiny function-word lists for the lang-id heuristic. The heuristic is the
# operator; the lists are deliberately small and fixed so Spark and the SQL
# oracle share one definition.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "du", "que"],
    "es": ["el", "los", "las", "y", "es", "en", "una", "por", "con", "para"],
}
LANG_PRIORITY = ["en", "de", "fr", "es"]  # deterministic tie-break order


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    return (
        F.when(F.length(F.trim(text)) == 0, F.lit(0))
        .otherwise(F.size(tokens(text)))
        .cast("int")
    )


# BPE-ish pre-tokenization pattern (GPT-2-style word/number/punct split,
# simplified to constructs RE2 (DuckDB) and java.util.regex share).
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def bpe_token_count(text: Column) -> Column:
    """Token count under BPE-style pre-tokenization: letter runs, digit
    runs, and single punctuation marks each count as one token."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0))).cast("int")


def normalized(text: Column) -> Column:
    """Normalization for fingerprinting: lowercase, strip non-alnum,
    collapse whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[^a-z0-9 ]", " ")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized(text))


def _stopword_hits(text: Column, lang: str) -> Column:
    """Distinct stopwords of ``lang`` present in the text."""
    return F.size(F.array_intersect(tokens(text), F.array(*[F.lit(w) for w in STOPWORDS[lang]])))


def lang_id(text: Column) -> Column:
    """Argmax of stopword overlap across languages, ties broken by
    LANG_PRIORITY order; 'und' (undetermined) when no stopword hits."""
    scores = {lang: _stopword_hits(text, lang) for lang in LANG_PRIORITY}
    expr = F.lit("und")
    # Build the CASE chain back-to-front so earlier languages win ties.
    for lang in reversed(LANG_PRIORITY):
        later = [scores[o] for o in LANG_PRIORITY[LANG_PRIORITY.index(lang) + 1 :]]
        cond = scores[lang] > 0
        if len(later) == 1:
            cond = cond & (scores[lang] >= later[0])
        elif later:
            cond = cond & (scores[lang] >= F.greatest(*later))
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def alpha_ratio(text: Column) -> Column:
    return F.length(F.regexp_replace(text, "[^a-zA-Z]", "")).cast("double") / F.greatest(
        F.length(text), F.lit(1)
    ).cast("double")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: token-count saturation, alphabetic
    ratio, english-stopword ratio. All double arithmetic — deterministic."""
    nt = token_count(text).cast("double")
    stop_ratio = _stopword_hits(text, "en").cast("double") / F.greatest(nt, F.lit(1.0))
    return (
        F.least(nt / F.lit(100.0), F.lit(1.0)) * 0.4
        + alpha_ratio(text) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.2
    )


def text_features(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """All text-analysis columns at once over a documents table."""
    t = F.col(text_col)
    return documents.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        fingerprint(t).alias("fingerprint"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
    )


# --- DuckDB oracle templates (same definitions, SQL dialect) ----------------

_DUCK_TOKENS = "regexp_split_to_array(trim(text), '\\s+')"


def _duck_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_distinct(list_intersect({_DUCK_TOKENS}, [{words}])))"


def _duck_lang_case() -> str:
    exprs = []
    for i, lang in enumerate(LANG_PRIORITY):
        later = LANG_PRIORITY[i + 1 :]
        if later:
            cond = f"s_{lang} > 0 AND s_{lang} >= greatest({', '.join('s_' + o for o in later)})"
        else:
            cond = f"s_{lang} > 0"
        exprs.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(exprs) + " ELSE 'und' END"


_DUCK_NTOK = (
    f"CAST(CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len({_DUCK_TOKENS}) END AS INTEGER)"
)
_DUCK_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)
_DUCK_ALPHA = (
    "CAST(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)"
    " / CAST(greatest(len(text), 1) AS DOUBLE)"
)

# Consolidated one-row-per-doc oracle for text_features (all five analysis
# columns in a single relation — one driver-recorded row covers the suite;
# the single-column variants stay in the extra registry for local checks).
def text_features_oracle() -> str:
    return f"""
        SELECT doc_id, {_DUCK_NTOK} AS n_tokens,
               CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS INTEGER)
                 AS n_bpe_tokens,
               md5({_DUCK_NORM}) AS fingerprint,
               {_duck_lang_case()} AS lang_pred,
               least(CAST(n_tokens_i AS DOUBLE) / 100.0, 1.0) * 0.4
               + alpha * 0.4
               + least((CAST(s_en AS DOUBLE) / greatest(CAST(n_tokens_i AS DOUBLE), 1.0)) * 5.0, 1.0) * 0.2
                 AS quality
        FROM (
          SELECT doc_id, text, {_DUCK_NTOK} AS n_tokens_i, {_DUCK_ALPHA} AS alpha,
                 {_duck_hits('en')} AS s_en, {_duck_hits('de')} AS s_de,
                 {_duck_hits('fr')} AS s_fr, {_duck_hits('es')} AS s_es
          FROM documents
        )
    """


TEXT_ORACLES = {
    "text_token_count": f"SELECT doc_id, {_DUCK_NTOK} AS n_tokens FROM documents",
    "text_bpe_token_count": (
        "SELECT doc_id, CAST(len(regexp_extract_all(text,"
        f" '{BPE_PATTERN}')) AS INTEGER) AS n_bpe_tokens FROM documents"
    ),
    "text_fingerprint": f"SELECT doc_id, md5({_DUCK_NORM}) AS fingerprint FROM documents",
    "text_lang_id": f"""
        SELECT doc_id, {_duck_lang_case()} AS lang_pred FROM (
          SELECT doc_id,
                 {_duck_hits('en')} AS s_en, {_duck_hits('de')} AS s_de,
                 {_duck_hits('fr')} AS s_fr, {_duck_hits('es')} AS s_es
          FROM documents
        )
    """,
    "text_quality_score": f"""
        SELECT doc_id,
               least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
               + alpha * 0.4
               + least((CAST(s_en AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0)) * 5.0, 1.0) * 0.2
               AS quality
        FROM (
          SELECT doc_id, {_DUCK_NTOK} AS n_tokens, {_DUCK_ALPHA} AS alpha,
                 {_duck_hits('en')} AS s_en
          FROM documents
        )
    """,
}


def tfidf_top_terms(
    documents: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k salient terms per document by tf * idf with a RATIONAL idf,
    idf = (N + 1) / (df + 1) — same ranking family as log-idf but pure
    integer-ratio arithmetic, so every score is a deterministic double that
    any SQL engine reproduces bit-for-bit (ln() differs in the last ulp
    across libm implementations and would break hash parity).

    Scale: one shuffle for the (doc, term) tf aggregate, one for the df
    aggregate (grouped on term), a broadcast of the (small) df relation back
    onto the tf stream, and a per-doc top-k window. df is |vocabulary|-sized
    — broadcast while it fits, hash join past that.
    """
    from pyspark.sql import Window

    toks = documents.select(
        F.col(id_col).alias("__id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("__id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_rel = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.select(F.countDistinct(id_col)).first()[0]
    scored = tf.join(F.broadcast(df_rel), "term").select(
        "__id",
        "term",
        (
            F.col("tf").cast("double")
            * (F.lit(float(n_docs + 1)) / (F.col("df") + F.lit(1)).cast("double"))
        ).alias("score"),
    )
    w = Window.partitionBy("__id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("__id").alias(id_col), "term", "rank", "score")
    )


def tfidf_oracle(k: int = 3) -> str:
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        ), dfr AS (
          SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
        ), n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
        SELECT doc_id, term, rank, score FROM (
          SELECT tf.doc_id, tf.term,
                 CAST(tf.tf AS DOUBLE)
                   * (CAST(n.n_docs + 1 AS DOUBLE) / CAST(dfr.df + 1 AS DOUBLE))
                   AS score,
                 ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                    ORDER BY CAST(tf.tf AS DOUBLE)
                                      * (CAST(n.n_docs + 1 AS DOUBLE)
                                         / CAST(dfr.df + 1 AS DOUBLE)) DESC,
                                      tf.term) AS rank
          FROM tf JOIN dfr USING (term) CROSS JOIN n
        ) WHERE rank <= {k}
    """


def lm_vocab(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Train the corpus-unigram LM used by ``lm_surprisal``: returns
    ``(freqs, total)`` — the (term, c) count relation and the 1-row token
    total. Computed once and frozen (localCheckpoint at the call site),
    this is the "reference LM" a production ingest filter loads — scoring
    a stream against it is then stateless per document."""
    toks = (
        documents.select(
            F.col(id_col), F.explode(tokens(normalized(F.col(text_col)))).alias("t")
        ).filter(F.col("t") != "")
    )
    tf = toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    freqs = tf.groupBy("t").agg(F.sum("tf").alias("c"))
    total = freqs.agg(F.sum("c").alias("n"))
    return freqs, total


def lm_surprisal(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Per-document quantized unigram surprisal — the CCNet/RefinedWeb-style
    "LM perplexity" quality filter, with the corpus itself as the language
    model. A document of common tokens scores low (boilerplate-ish); rare
    tokens score high (unusual or noisy text). Output:
    ``(id, n_tokens, avg_surprisal_bits)``.

    Per token instance the surprisal is floor(log2(N / c(t))) bits, where
    c(t) is the corpus count of the (normalized) token and N the corpus
    token total — computed as ``length(bin(N div c)) - 1``, pure integer
    arithmetic both engines evaluate identically (same rationale as the
    rational idf above: ln()/log2() differ in the last ulp across libm
    implementations and would break hash parity). The doc score is the
    exact int sum of bits divided by the token count, as a double.

    Scale: explode → term-count shuffle, a join of the token stream with
    the |vocabulary|-sized count relation (broadcast while it fits, hash
    join past that), one per-doc aggregation. No Python anywhere.

    ``model``: optional pre-trained ``(freqs, total)`` from :func:`lm_vocab`
    — score these documents against a FROZEN reference LM instead of
    themselves (the streaming-ingest shape; unknown tokens are skipped,
    exactly what the self-trained form can never hit).
    """
    toks = (
        documents.select(F.col(id_col), F.explode(tokens(normalized(F.col(text_col)))).alias("t"))
        .filter(F.col("t") != "")
    )
    # aggregate to (doc, term, tf) FIRST: the vocabulary join and the final
    # per-doc aggregation then carry distinct pairs, not token instances
    # (the per-instance sum equals sum(tf * bits) exactly — integers)
    tf = toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    if model is not None:
        freqs, total = model
    else:
        freqs = tf.groupBy("t").agg(F.sum("tf").alias("c"))
        total = freqs.agg(F.sum("c").alias("n"))
    bits = (
        tf.join(freqs, "t")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            "tf",
            (F.length(F.bin(F.expr("n div c"))) - 1).alias("__bits"),
        )
    )
    return bits.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        (
            F.sum(F.col("tf") * F.col("__bits")).cast("double") / F.sum("tf")
        ).alias("avg_surprisal_bits"),
    )


def lm_surprisal_oracle() -> str:
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split_regex({_DUCK_NORM}, '\\s+')) AS t
          FROM documents
        ), tok2 AS (
          SELECT * FROM tok WHERE t <> ''
        ), f AS (
          SELECT t, COUNT(*) AS c FROM tok2 GROUP BY t
        ), n AS (
          SELECT CAST(SUM(c) AS BIGINT) AS n FROM f
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(CAST(SUM(len(bin(n.n // f.c)) - 1) AS BIGINT) AS DOUBLE)
                 / COUNT(*) AS avg_surprisal_bits
        FROM tok2 JOIN f USING (t) CROSS JOIN n
        GROUP BY doc_id
    """


BACKOFF_BITS = 2  # stupid-backoff alpha ~= 0.25, quantized to whole bits


def bigram_surprisal(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_pred: Column | None = None,
) -> DataFrame:
    """Per-document quantized BIGRAM surprisal with stupid backoff — the
    next step up from :func:`lm_surprisal`'s unigram filter: fluent word
    ORDER now matters, so shuffled/templated text scores high even when its
    vocabulary is common. Output: ``(id, n_bigrams, avg_bigram_bits)``.

    Model (trained on the ``train_pred`` subset; the whole corpus when
    None): for adjacent normalized tokens (w1, w2),

    - seen bigram:  bits = floor(log2(c1(w1) / c2(w1, w2)))  — the
      conditional surprisal  -log2 P(w2 | w1);
    - unseen bigram, known w2: bits = BACKOFF_BITS + floor(log2(N / c1(w2)))
      — stupid backoff (Brants et al. 2007) to the unigram, with a
      whole-bit penalty in place of the non-portable log2(1/alpha);
    - unknown w2: the position is skipped (mirrors ``lm_surprisal``'s
      frozen-model behavior).

    All counts are exact BIGINTs and every log2 is the ``length(bin(x))-1``
    integer quantization, so Spark and DuckDB agree bit-for-bit (libm-free,
    same rationale as ``lm_surprisal``). The one double is the final
    division.

    Scale: one explode, one per-doc window (lead over token position, one
    Exchange on the id), pair aggregation to ``(doc, w1, w2, tf)`` BEFORE
    the model joins — the vocabulary-sized count relations broadcast while
    they fit. The aggregated pair relation is localCheckpoint-ed: it feeds
    both the model derivation and the scoring join (multi-consumer cut).
    """
    from pyspark.sql import Window

    toks = (
        documents.select(
            F.col(id_col),
            F.posexplode(tokens(normalized(F.col(text_col)))).alias("__p", "t"),
        ).filter(F.col("t") != "")
    )
    w = Window.partitionBy(id_col).orderBy("__p")
    pr = toks.select(
        F.col(id_col), F.col("t").alias("w1"), F.lead("t").over(w).alias("w2")
    ).filter(F.col("w2").isNotNull())
    pairs = (
        pr.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint()
    )
    train_pairs = pairs if train_pred is None else pairs.filter(train_pred)
    c2 = train_pairs.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    ttoks = toks if train_pred is None else toks.filter(train_pred)
    c1 = ttoks.groupBy("t").agg(F.count(F.lit(1)).alias("c1"))
    total = c1.agg(F.sum("c1").alias("n"))
    flog2 = lambda x: F.length(F.bin(F.expr(x))) - 1
    scored = (
        pairs.join(c2, ["w1", "w2"], "left")
        .join(c1.select(F.col("t").alias("w1"), F.col("c1").alias("c1w1")), "w1", "left")
        .join(c1.select(F.col("t").alias("w2"), F.col("c1").alias("c1w2")), "w2", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            "tf",
            F.when(F.col("c2").isNotNull(), flog2("c1w1 div c2"))
            .when(
                F.col("c1w2").isNotNull(),
                F.lit(BACKOFF_BITS) + flog2("n div c1w2"),
            )
            .alias("__bits"),
        )
        .filter(F.col("__bits").isNotNull())
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_bigrams"),
        (
            F.sum(F.col("tf") * F.col("__bits")).cast("double") / F.sum("tf")
        ).alias("avg_bigram_bits"),
    )


def bigram_surprisal_oracle(train_where: str = "TRUE") -> str:
    """DuckDB twin of :func:`bigram_surprisal`; ``train_where`` mirrors the
    Spark ``train_pred`` (a predicate over doc_id)."""
    return f"""
        WITH tok AS MATERIALIZED (
          SELECT doc_id, t, p FROM (
            SELECT doc_id, unnest(arr) AS t, generate_subscripts(arr, 1) AS p
            FROM (SELECT doc_id, string_split_regex({_DUCK_NORM}, '\\s+') AS arr
                  FROM documents)
          ) WHERE t <> ''
        ), pr AS (
          SELECT doc_id, t AS w1,
                 LEAD(t) OVER (PARTITION BY doc_id ORDER BY p) AS w2
          FROM tok
        ), pairs AS MATERIALIZED (
          SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf
          FROM pr WHERE w2 IS NOT NULL GROUP BY doc_id, w1, w2
        ), c2 AS (
          SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c2 FROM pairs
          WHERE {train_where} GROUP BY w1, w2
        ), c1 AS MATERIALIZED (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS c1 FROM tok
          WHERE {train_where} GROUP BY t
        ), n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n FROM c1)
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
               CAST(CAST(SUM(tf * bits) AS BIGINT) AS DOUBLE) / SUM(tf)
                 AS avg_bigram_bits
        FROM (
          SELECT pairs.doc_id, pairs.tf,
                 CASE WHEN c2.c2 IS NOT NULL THEN len(bin(u1.c1 // c2.c2)) - 1
                      WHEN u2.c1 IS NOT NULL
                        THEN {BACKOFF_BITS} + len(bin(n.n // u2.c1)) - 1
                 END AS bits
          FROM pairs
          LEFT JOIN c2 ON pairs.w1 = c2.w1 AND pairs.w2 = c2.w2
          LEFT JOIN c1 u1 ON pairs.w1 = u1.t
          LEFT JOIN c1 u2 ON pairs.w2 = u2.t
          CROSS JOIN n
        ) WHERE bits IS NOT NULL
        GROUP BY doc_id
    """


def bm25_topk(
    documents: DataFrame,
    queries: DataFrame,
    topk: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval: score a (small) query set against the corpus
    and return the top-k documents per query — the retrieval primitive a
    RAG/training pipeline runs next to ANN search.

    ``queries``: (query_id, query_text). Output:
    ``(query_id, doc_id, rank, score)``.

    Okapi BM25 with k1=1.2, b=0.75 and a QUANTIZED idf: instead of
    ln((N-df+.5)/(df+.5)) — whose libm last-ulp varies across engines —
    idf(t) = floor(log2(N_docs div df(t))) computed as
    ``length(bin(N div df)) - 1``, pure integer arithmetic (the same
    determinism device as ``lm_surprisal``). Per-term contributions are
    doubles quantized to integers (floor(w*1e12 + 0.5)) before the SUM, so
    accumulation order cannot change the score (DESIGN.md: never SUM raw
    doubles across engines); the final score divides back to a double.

    Scale shape: the query-term join hits the (doc, term, tf) relation
    FIRST with a broadcast of the tiny query-term set — the corpus-sized
    stream is filtered to query terms before any other join; df/dl stats
    join after on the filtered stream. One aggregation per (query, doc),
    one top-k window per query. No Python anywhere.
    """
    toks = documents.select(
        F.col(id_col), F.explode(tokens(normalized(F.col(text_col)))).alias("t")
    ).filter(F.col("t") != "")
    qt = (
        queries.select(
            "query_id", F.explode(tokens(normalized(F.col("query_text")))).alias("t")
        )
        .filter(F.col("t") != "")
        .distinct()
    )
    # Broadcast-filter the token stream to QUERY TERMS before any
    # aggregation: the (doc, term) tf shuffle then carries only the query
    # terms' postings, not the full corpus vocabulary. df(t) is identical
    # computed from the filtered stream (a doc contains t or it doesn't).
    toks_f = toks.join(F.broadcast(qt.select("t").distinct()), "t")
    tf = toks_f.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    dfr = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    # doc lengths / corpus stats need ALL tokens, but map-side partial
    # combine reduces the shuffle to one narrow row per doc
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    bits = (F.length(F.bin(F.expr("n_docs div df"))) - F.lit(1)).cast("double")
    w = (bits * (F.col("tf") * F.lit(2.2))) / (
        F.col("tf")
        + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * (F.col("dl") / F.col("avgdl")))
    )
    contrib = (
        tf.join(F.broadcast(qt), "t")
        .join(dfr, "t")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            F.col(id_col),
            F.floor(w * F.lit(1e12) + F.lit(0.5)).cast("bigint").alias("__s"),
        )
    )
    scored = contrib.groupBy("query_id", id_col).agg(F.sum("__s").alias("__sum"))
    from pyspark.sql import Window

    rnk = Window.partitionBy("query_id").orderBy(F.col("__sum").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(rnk))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            id_col,
            "rank",
            (F.col("__sum").cast("double") / F.lit(1e12)).alias("score"),
        )
    )


def bm25_oracle(query_values: str, topk: int = 10) -> str:
    """DuckDB twin of ``bm25_topk``. ``query_values`` is a SQL VALUES body
    like ``(0, 'fast table scan'), (1, ...)``."""
    norm_q = _DUCK_NORM.replace("(text)", "(qtext)").replace("lower(text)", "lower(qtext)")
    return f"""
        WITH q(query_id, qtext) AS (VALUES {query_values}),
        qt AS (
          SELECT DISTINCT query_id, t FROM (
            SELECT query_id, unnest(string_split_regex({norm_q}, '\\s+')) AS t
            FROM q
          ) WHERE t <> ''
        ), tok AS (
          SELECT doc_id, t FROM (
            SELECT doc_id, unnest(string_split_regex({_DUCK_NORM}, '\\s+')) AS t
            FROM documents
          ) WHERE t <> ''
        ), tf AS (
          SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
        ), dl AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1
        ), dfr AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        ), stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
          FROM dl
        ), contrib AS (
          SELECT qt.query_id, tf.doc_id,
                 CAST(floor(
                   ((CAST(len(bin(stats.n_docs // dfr.df)) - 1 AS DOUBLE)
                     * (tf.tf * 2.2))
                    / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / stats.avgdl))))
                   * 1e12 + 0.5) AS BIGINT) AS s
          FROM tf
          JOIN qt USING (t)
          JOIN dfr USING (t)
          JOIN dl USING (doc_id)
          CROSS JOIN stats
        )
        SELECT query_id, doc_id, rank, score FROM (
          SELECT query_id, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY CAST(SUM(s) AS BIGINT) DESC, doc_id)
                   AS rank,
                 CAST(CAST(SUM(s) AS BIGINT) AS DOUBLE) / 1e12 AS score
          FROM contrib GROUP BY query_id, doc_id
        ) WHERE rank <= {topk}
    """


def pmi_collocations(
    documents: DataFrame,
    topk: int = 30,
    min_count: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level collocation mining: the top-k adjacent-token bigrams by
    (quantized) pointwise mutual information — the classic phrase detector
    (word2vec's phrase pass, NLTK collocations) over the whole corpus.

    PMI = log2( p(ab) / (p(a) p(b)) ) quantized to whole bits the usual
    way: ``length(bin((c_ab * N) div (c_a * c_b))) - 1``, integer-exact in
    both engines (N = total bigram instances; unigram counts from the same
    token stream). Pairs with ratio < 1 (PMI < 0) or count < ``min_count``
    are dropped. Ranking: (pmi_bits, c_ab, a, b) — fully deterministic.

    Plan: bigrams come from ``zip_with`` over two shifted slices of the
    per-doc token array (no positional self-join, no window), then one
    hash-agg per relation; the unigram relation joins twice (broadcast at
    vocabulary scale). Top-k via one TakeOrderedAndProject.
    """
    # explode(sequence) + element_at: whole-stage codegen bigram rows (the
    # repo's measured rule — higher-order array lambdas are interpreted and
    # 10-30x slower in hot paths; same device as exploded_word_ngrams)
    toks = documents.select(
        F.col(id_col), tokens(normalized(F.col(text_col))).alias("__t")
    ).filter(F.size("__t") >= 2)
    bigrams = (
        toks.select(
            F.col("__t"),
            F.explode(F.sequence(F.lit(1), F.size("__t") - 1)).alias("__i"),
        )
        .select(
            F.element_at("__t", F.col("__i")).alias("a"),
            F.element_at("__t", F.col("__i") + 1).alias("b"),
        )
        .filter((F.col("a") != "") & (F.col("b") != ""))
    )
    c_ab = bigrams.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    n_tot = c_ab.agg(F.sum("c_ab").alias("n_bigrams"))
    uni = (
        documents.select(F.explode(tokens(normalized(F.col(text_col)))).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scored = (
        c_ab.filter(F.col("c_ab") >= min_count)
        .join(F.broadcast(uni.select(F.col("t").alias("a"), F.col("c").alias("c_a"))), "a")
        .join(F.broadcast(uni.select(F.col("t").alias("b"), F.col("c").alias("c_b"))), "b")
        .crossJoin(F.broadcast(n_tot))
        .withColumn("__ratio", F.expr("(c_ab * n_bigrams) div (c_a * c_b)"))
        .filter(F.col("__ratio") >= 1)
        .withColumn("pmi_bits", (F.length(F.bin(F.col("__ratio"))) - F.lit(1)).cast("int"))
    )
    return (
        scored.orderBy(
            F.col("pmi_bits").desc(), F.col("c_ab").desc(), F.col("a"), F.col("b")
        )
        .limit(topk)
        .select("a", "b", "c_ab", "pmi_bits")
    )


def pmi_oracle(topk: int = 30, min_count: int = 3) -> str:
    """DuckDB twin of ``pmi_collocations`` (aligned-unnest zip for the
    shifted slices — the same device as the kmeans scalar oracle)."""
    return f"""
        WITH tl AS (
          SELECT doc_id, string_split_regex({_DUCK_NORM}, '\\s+') AS l
          FROM documents
        ), big AS (
          SELECT unnest(list_slice(l, 1, len(l) - 1)) AS a,
                 unnest(list_slice(l, 2, len(l))) AS b
          FROM tl WHERE len(l) >= 2
        ), c_ab AS (
          SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab FROM big
          WHERE a <> '' AND b <> '' GROUP BY a, b
        ), n AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_bigrams FROM c_ab),
        uni AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT unnest(string_split_regex({_DUCK_NORM}, '\\s+')) AS t
            FROM documents
          ) WHERE t <> '' GROUP BY t
        ), scored AS (
          SELECT c_ab.a, c_ab.b, c_ab.c_ab,
                 (c_ab.c_ab * n.n_bigrams) // (ua.c * ub.c) AS ratio
          FROM c_ab
          JOIN uni ua ON c_ab.a = ua.t
          JOIN uni ub ON c_ab.b = ub.t
          CROSS JOIN n
          WHERE c_ab.c_ab >= {min_count}
        )
        SELECT a, b, c_ab,
               CAST(len(bin(ratio)) - 1 AS INTEGER) AS pmi_bits
        FROM scored WHERE ratio >= 1
        ORDER BY pmi_bits DESC, c_ab DESC, a, b LIMIT {topk}
    """


def boolean_search(
    documents: DataFrame,
    terms: list[str],
    mode: str = "and",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inverted-index boolean retrieval: documents matching ALL (``and``)
    or ANY (``or``) normalized query terms — the posting-list intersection
    primitive under every search stack (BM25 ranks what this selects).
    Output: ``(id, n_matched, n_hits)`` — distinct query terms present and
    total matching token instances.

    Scale: the explode is pre-filtered by the broadcast literal term set
    BEFORE any aggregation, so the shuffle carries only matching tokens
    (posting-list sized, not corpus sized); one (doc, term) distinct-count
    aggregation. AND is a count == |terms| post-filter — no k-way self-join.
    """
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    toks = (
        documents.select(
            F.col(id_col), F.explode(tokens(normalized(F.col(text_col)))).alias("t")
        )
        .filter(F.col("t").isin(*terms))
    )
    out = toks.groupBy(id_col).agg(
        F.count_distinct(F.col("t")).alias("n_matched"),
        F.count(F.lit(1)).alias("n_hits"),
    )
    if mode == "and":
        out = out.filter(F.col("n_matched") == len(terms))
    return out


def boolean_search_oracle(terms: list[str], mode: str = "and") -> str:
    lits = ", ".join(f"'{t}'" for t in terms)
    gate = f"HAVING COUNT(DISTINCT t) = {len(terms)}" if mode == "and" else ""
    return f"""
        SELECT doc_id, CAST(COUNT(DISTINCT t) AS BIGINT) AS n_matched,
               CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM (
          SELECT doc_id, unnest(string_split_regex({_DUCK_NORM}, '\\s+')) AS t
          FROM documents
        ) WHERE t IN ({lits})
        GROUP BY doc_id {gate}
    """


def phrase_search(
    documents: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-phrase retrieval over the POSITIONAL index: a match is the
    phrase's tokens at consecutive normalized-token positions — what
    boolean AND (bag-of-words) cannot express and every search engine
    implements with position-carrying posting lists. Output:
    ``(id, n_occurrences)`` for documents containing the phrase.

    Implementation is the positional-index join flattened into ONE window
    stage: explode with position, then length-1 ``lead`` chains per doc
    compare each slot against the phrase — a single Exchange on the doc
    id, no self-joins (k-1 joins would shuffle k times).
    """
    from pyspark.sql import Window

    if len(phrase) < 2:
        raise ValueError("use boolean_search for single terms")
    toks = (
        documents.select(
            F.col(id_col),
            F.posexplode(tokens(normalized(F.col(text_col)))).alias("__p", "t"),
        ).filter(F.col("t") != "")
    )
    w = Window.partitionBy(id_col).orderBy("__p")
    cond = F.col("t") == phrase[0]
    for i, term in enumerate(phrase[1:], start=1):
        cond = cond & (F.lead("t", i).over(w) == term)
    return (
        toks.withColumn("__m", cond)
        .filter(F.col("__m"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


def phrase_search_oracle(phrase: list[str]) -> str:
    conds = [f"t = '{phrase[0]}'"] + [
        f"LEAD(t, {i}) OVER (PARTITION BY doc_id ORDER BY p) = '{term}'"
        for i, term in enumerate(phrase[1:], start=1)
    ]
    return f"""
        WITH tok AS (
          SELECT doc_id, t, p FROM (
            SELECT doc_id, unnest(arr) AS t, generate_subscripts(arr, 1) AS p
            FROM (SELECT doc_id, string_split_regex({_DUCK_NORM}, '\\s+') AS arr
                  FROM documents)
          ) WHERE t <> ''
        ), m AS (
          SELECT doc_id, ({" AND ".join(conds)}) AS hit FROM tok
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM m WHERE hit GROUP BY doc_id
    """


def token_entropy(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution, quantized
    to whole bits — the repetitiveness/diversity gate (template spam and
    keyword-stuffed pages score near 0; natural prose scores high). The
    complement of ``lm_surprisal``: that scores a doc against the CORPUS
    distribution, this scores it against ITSELF.

    Per distinct token the contribution is ``tf * floor(log2(n / tf))``
    bits (n = doc token count) via the integer ``length(bin(n div tf)) -
    1`` idiom — exact BIGINTs both engines agree on; the average is one
    double division at the boundary.

    Output: ``(id, n_tokens, n_distinct, avg_entropy_bits)``.
    Scale: explode → one (doc, token) count aggregation → one per-doc
    aggregation; no joins, no Python.
    """
    tf = (
        documents.select(
            F.col(id_col), F.explode(tokens(normalized(F.col(text_col)))).alias("t")
        )
        .filter(F.col("t") != "")
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy(id_col)
    return (
        tf.withColumn("n", F.sum("tf").over(w))
        .groupBy(id_col)
        .agg(
            F.max("n").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            (
                F.sum(
                    F.col("tf") * (F.length(F.bin(F.expr("n div tf"))) - 1)
                ).cast("double")
                / F.max("n")
            ).alias("avg_entropy_bits"),
        )
    )


def token_entropy_oracle() -> str:
    """DuckDB twin of :func:`token_entropy` (documents table)."""
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split_regex({_DUCK_NORM}, '\\s+')) AS t
          FROM documents
        ), tf AS (
          SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
          FROM tok WHERE t <> '' GROUP BY doc_id, t
        ), wn AS (
          SELECT doc_id, t, tf,
                 CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS n
          FROM tf
        )
        SELECT doc_id, MAX(n) AS n_tokens, CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(SUM(tf * (len(bin(n // tf)) - 1)) AS DOUBLE) / MAX(n)
                 AS avg_entropy_bits
        FROM wn GROUP BY doc_id
    """


def winnowing_fingerprints(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003 —
    the MOSS algorithm): hash every character ``k``-gram of the
    normalized text, then keep the MINIMUM hash of each sliding window
    of ``w`` consecutive grams. Winnowing guarantees any shared substring
    of length >= k + w - 1 contributes a shared fingerprint, while
    selecting only ~2/(w+1) of the grams — the density/recall tradeoff
    that makes corpus-scale overlap detection affordable.

    The selected set is the DISTINCT window-minimum values — one ordered
    window per document (ROWS CURRENT..w-1 FOLLOWING) over md5-derived
    32-bit integer hashes, so Spark and the oracle agree bit-for-bit.

    Output: ``(id, n_grams, n_fingerprints)``; the distinct (id,
    fingerprint) relation drives shared-span pair detection exactly like
    ``shared_spans`` drives n-gram overlap.
    """
    from flink_example_spark.operators.sketch import portable_hash32

    norm = normalized(F.col(text_col))
    # spread before the per-char gram hashing: a single-file corpus scans
    # as ONE partition and the md5-per-position work would run single-task
    # (guide SS2.5 input skew; r14 probe). Keyed by id at defaultParallelism
    # so the window's hashpartitioning(id) is already satisfied.
    grams = (
        spread(documents, F.col(id_col)).select(F.col(id_col).alias("id"), norm.alias("nt"))
        .filter(F.length("nt") >= k + w - 1)
        .select(
            "id",
            F.explode(
                F.sequence(F.lit(1), F.length("nt") - F.lit(k - 1))
            ).alias("p"),
            "nt",
        )
        .select(
            "id", "p", portable_hash32(F.expr(f"substr(nt, p, {k})")).alias("h")
        )
    )
    win = Window.partitionBy("id").orderBy("p").rowsBetween(0, w - 1)
    sel = (
        grams.withColumn("n_in_win", F.count(F.lit(1)).over(win))
        .withColumn("fp", F.min("h").over(win))
        .filter(F.col("n_in_win") == w)
    )
    return (
        sel.groupBy("id")
        .agg(
            (F.max("p") + F.lit(w + k - 2)).alias("__span"),
            F.count(F.lit(1)).alias("n_windows"),
            F.countDistinct("fp").alias("n_fingerprints"),
        )
        .select(
            F.col("id").alias(id_col),
            (F.col("n_windows") + F.lit(w - 1)).alias("n_grams"),
            "n_fingerprints",
        )
    )


def winnowing_oracle(k: int = 8, w: int = 4) -> str:
    """DuckDB twin of :func:`winnowing_fingerprints` (documents table)."""
    return f"""
        WITH grams AS MATERIALIZED (
          SELECT doc_id AS id, p,
                 CAST(concat('0x', substr(md5(substr(nt, CAST(p AS INTEGER), {k})),
                      1, 8)) AS BIGINT) AS h
          FROM (
            SELECT doc_id, {_DUCK_NORM} AS nt FROM documents
          ), unnest(range(1, len(nt) - {k - 1} + 1)) AS r(p)
          WHERE len(nt) >= {k + w - 1}
        ), sel AS (
          SELECT id, p,
                 COUNT(*) OVER win AS n_in_win,
                 MIN(h) OVER win AS fp
          FROM grams
          WINDOW win AS (PARTITION BY id ORDER BY p
                         ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
        )
        SELECT id AS doc_id,
               CAST(COUNT(*) + {w - 1} AS BIGINT) AS n_grams,
               CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fingerprints
        FROM sel WHERE n_in_win = {w}
        GROUP BY id
    """


def zipf_fit(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Zipf's-law fit of the corpus rank-frequency curve: OLS of
    ``floor(log2 count)`` against ``floor(log2 rank)`` — natural text
    slopes near −1; template spam and synthetic corpora bend the curve.
    Composes the corpus term counts (one aggregation + one rank window)
    with :func:`~flink_example_spark.operators.ml.linear_fit`'s exact
    integer sufficient statistics; the quantized-log regression keeps
    every accumulated value a BIGINT (the DESIGN.md integer-log2 idiom).

    Output: one row ``(grp='zipf', n, slope, intercept, r2)`` where n is
    the vocabulary size.
    """
    from flink_example_spark.operators.ml import linear_fit

    freqs = (
        documents.select(
            F.explode(tokens(normalized(F.col(text_col)))).alias("t")
        )
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from flink_example_spark.operators.distrank import dist_row_number

    ranked = dist_row_number(
        freqs, [F.desc("c"), F.col("t")], "r"
    ).select(
        F.lit("zipf").alias("g"),
        (F.length(F.bin(F.col("r"))) - 1).alias("lr"),
        (F.length(F.bin(F.col("c"))) - 1).alias("lc"),
    )
    return linear_fit(ranked, "g", "lr", "lc")


def zipf_oracle() -> str:
    """DuckDB twin of :func:`zipf_fit` (documents table)."""
    from flink_example_spark.operators.ml import linear_fit_oracle

    src = f"""
        SELECT 'zipf' AS g,
               len(bin(CAST(ROW_NUMBER() OVER (ORDER BY c DESC, t) AS BIGINT))) - 1
                 AS lr,
               len(bin(c)) - 1 AS lc
        FROM (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT unnest(string_split_regex({_DUCK_NORM}, '\\s+')) AS t
            FROM documents
          ) WHERE t <> '' GROUP BY t
        )
    """
    return linear_fit_oracle(src, "g", "lr", "lc")


def readability(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Readability scoring (Flesch reading-ease / FK grade level) — the
    classic prose-quality features web-corpus filters cut on. Sentences
    are ``[.!?]+`` runs, words are the shared whitespace tokenization,
    and syllables use the standard vowel-GROUP approximation (runs of
    [aeiouy] in the lowercased word), all via one shared regexp per
    engine — exact integer counts, so both formulas are fixed double-op
    sequences over exact BIGINTs:

        ease  = 206.835 − 1.015·(W/S) − 84.6·(Y/W)
        grade = 0.39·(W/S) + 11.8·(Y/W) − 15.59

    Output: ``(id, n_sentences, n_words, n_syllables, flesch_ease,
    fk_grade)``; empty docs are dropped.
    """
    txt = F.col(text_col)
    n_sent = F.greatest(
        F.lit(1).cast("bigint"),
        F.size(
            F.filter(
                F.split(txt, r"[.!?]+"),
                lambda s: F.length(F.trim(s)) > 0,
            )
        ).cast("bigint"),
    )
    words = F.filter(tokens(normalized(txt)), lambda t: t != F.lit(""))
    n_words = F.size(words).cast("bigint")
    # syllables: vowel groups per word, min 1 per word, summed via the
    # normalized text directly (same tokens, so word-count consistent)
    n_syll = F.aggregate(
        words,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc
        + F.greatest(
            F.lit(1).cast("bigint"),
            (
                F.size(F.split(F.regexp_replace(w, "[aeiouy]+", "#"), "#"))
                - F.lit(1)
            ).cast("bigint"),
        ),
    )
    base = documents.select(
        F.col(id_col),
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        n_syll.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    return base.select(
        id_col,
        "n_sentences",
        "n_words",
        "n_syllables",
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias(
            "flesch_ease"
        ),
        (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)).alias("fk_grade"),
    )


def readability_oracle() -> str:
    """DuckDB twin of :func:`readability` (documents table)."""
    return f"""
        WITH base AS (
          SELECT doc_id,
                 greatest(1, len(list_filter(
                   string_split_regex(text, '[.!?]+'),
                   s -> len(trim(s)) > 0))) AS n_sentences,
                 CAST(len(w) AS BIGINT) AS n_words,
                 CAST(list_sum(list_transform(w,
                   x -> greatest(1, len(string_split(
                        regexp_replace(x, '[aeiouy]+', '#', 'g'), '#')) - 1)))
                   AS BIGINT) AS n_syllables
          FROM (
            SELECT doc_id,
                   list_filter(string_split_regex({_DUCK_NORM}, '\\s+'),
                               t -> t <> '') AS w,
                   text
            FROM documents
          )
          WHERE len(w) > 0
        )
        SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
               n_words, n_syllables,
               206.835 - 1.015 * (CAST(n_words AS DOUBLE)
                                  / CAST(n_sentences AS DOUBLE))
                       - 84.6 * (CAST(n_syllables AS DOUBLE)
                                 / CAST(n_words AS DOUBLE)) AS flesch_ease,
               0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                 + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
                 - 15.59 AS fk_grade
        FROM base
    """


def winnowing_containment(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    threshold_num: int = 8,
    threshold_den: int = 10,
) -> DataFrame:
    """Copy/containment detection on winnowing fingerprints: pairs where
    ``|fp(A) ∩ fp(B)| / |fp(A)|`` meets the rational threshold — the
    ASYMMETRIC overlap that catches "document A is lifted into B" where
    symmetric Jaccard stays low because B is much larger (the MOSS use
    case). Threshold gate is cross-multiplied in integers; the emitted
    ratio is one exact double division.

    Output: ``(id_a, id_b, n_shared, size_a, containment)`` — directed
    (id_a is the contained side), both directions evaluated.
    """
    from flink_example_spark.operators.sketch import portable_hash32

    norm = normalized(F.col(text_col))
    # spread before the per-char gram hashing: a single-file corpus scans
    # as ONE partition and the md5-per-position work would run single-task
    # (guide SS2.5 input skew; r14 probe). Keyed by id at defaultParallelism
    # so the window's hashpartitioning(id) is already satisfied.
    grams = (
        spread(documents, F.col(id_col)).select(F.col(id_col).alias("id"), norm.alias("nt"))
        .filter(F.length("nt") >= k + w - 1)
        .select(
            "id",
            F.explode(F.sequence(F.lit(1), F.length("nt") - F.lit(k - 1))).alias("p"),
            "nt",
        )
        .select("id", "p", portable_hash32(F.expr(f"substr(nt, p, {k})")).alias("h"))
    )
    win = Window.partitionBy("id").orderBy("p").rowsBetween(0, w - 1)
    sel = (
        grams.withColumn("c", F.count(F.lit(1)).over(win))
        .withColumn("fp", F.min("h").over(win))
        .filter(F.col("c") == w)
        .select("id", "fp")
        .distinct()
        .localCheckpoint()
    )
    sizes = sel.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sel.select(F.col("id").alias("id_a"), "fp")
        .join(sel.select(F.col("id").alias("id_b"), "fp"), "fp")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), "sz"), "id_a")
        .filter(
            F.lit(threshold_den) * F.col("n_shared") >= F.lit(threshold_num) * F.col("sz")
        )
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.col("sz").alias("size_a"),
            (F.col("n_shared").cast("double") / F.col("sz").cast("double")).alias(
                "containment"
            ),
        )
    )


def winnowing_containment_oracle(
    k: int = 8, w: int = 4, threshold_num: int = 8, threshold_den: int = 10
) -> str:
    """DuckDB twin of :func:`winnowing_containment` (documents table)."""
    return f"""
        WITH grams AS MATERIALIZED (
          SELECT doc_id AS id, p,
                 CAST(concat('0x', substr(md5(substr(nt, CAST(p AS INTEGER), {k})),
                      1, 8)) AS BIGINT) AS h
          FROM (
            SELECT doc_id, {_DUCK_NORM} AS nt FROM documents
          ), unnest(range(1, len(nt) - {k - 1} + 1)) AS r(p)
          WHERE len(nt) >= {k + w - 1}
        ), sel AS MATERIALIZED (
          SELECT DISTINCT id, fp FROM (
            SELECT id,
                   MIN(h) OVER win AS fp,
                   COUNT(*) OVER win AS c
            FROM grams
            WINDOW win AS (PARTITION BY id ORDER BY p
                           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
          ) WHERE c = {w}
        ), sizes AS MATERIALIZED (
          SELECT id, CAST(COUNT(*) AS BIGINT) AS sz FROM sel GROUP BY id
        ), inter AS (
          SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
          FROM sel a JOIN sel b ON a.fp = b.fp AND a.id <> b.id
          GROUP BY a.id, b.id
        )
        SELECT i.id_a, i.id_b, i.n_shared, s.sz AS size_a,
               CAST(i.n_shared AS DOUBLE) / CAST(s.sz AS DOUBLE) AS containment
        FROM inter i JOIN sizes s ON s.id = i.id_a
        WHERE {threshold_den} * i.n_shared >= {threshold_num} * s.sz
    """


def heaps_fit(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: OLS of ``floor(log2 V(d))``
    against ``floor(log2 N(d))`` where, scanning docs in id order, N is
    the running token total and V the running distinct-vocabulary size —
    natural corpora grow V ≈ K·N^β with β ≈ 0.4-0.6; duplicated or
    templated corpora flatten early (a dedup-health signal).

    Mechanics: V(d) = count of terms whose FIRST occurrence is at doc
    ≤ d (one min-aggregate + one cumulative window over per-doc
    first-occurrence counts); N(d) is a running sum of per-doc token
    counts — no per-token window. Fit via the shared integer
    sufficient-statistics OLS.

    Output: one row ``(grp='heaps', n, slope, intercept, r2)``.
    """
    from flink_example_spark.operators.ml import linear_fit

    toks = documents.select(
        F.col(id_col).alias("d"),
        F.explode(tokens(normalized(F.col(text_col)))).alias("t"),
    ).filter(F.col("t") != "")
    per_doc = toks.groupBy("d").agg(F.count(F.lit(1)).alias("ntok"))
    first = toks.groupBy("t").agg(F.min("d").alias("fd"))
    new_terms = first.groupBy(F.col("fd").alias("d")).agg(
        F.count(F.lit(1)).alias("nv")
    )
    from flink_example_spark.operators.distrank import dist_cumsum

    curve = dist_cumsum(
        per_doc.join(new_terms, "d", "left").select(
            "d", "ntok", F.coalesce(F.col("nv"), F.lit(0)).alias("nv")
        ),
        ["d"],
        {"N": "ntok", "V": "nv"},
    )
    pts = curve.select(
        F.lit("heaps").alias("g"),
        (F.length(F.bin(F.col("N"))) - 1).alias("ln"),
        (F.length(F.bin(F.col("V"))) - 1).alias("lv"),
    )
    return linear_fit(pts, "g", "ln", "lv")


def heaps_oracle() -> str:
    """DuckDB twin of :func:`heaps_fit` (documents table)."""
    from flink_example_spark.operators.ml import linear_fit_oracle

    src = f"""
        SELECT 'heaps' AS g,
               len(bin(CAST(SUM(ntok) OVER w AS BIGINT))) - 1 AS ln,
               len(bin(CAST(SUM(nv) OVER w AS BIGINT))) - 1 AS lv
        FROM (
          SELECT pd.d, pd.ntok, COALESCE(nt.nv, 0) AS nv
          FROM (
            SELECT d, CAST(COUNT(*) AS BIGINT) AS ntok FROM (
              SELECT doc_id AS d,
                     unnest(string_split_regex({_DUCK_NORM}, '\\s+')) AS t
              FROM documents
            ) WHERE t <> '' GROUP BY d
          ) pd LEFT JOIN (
            SELECT fd AS d, CAST(COUNT(*) AS BIGINT) AS nv FROM (
              SELECT t, MIN(d) AS fd FROM (
                SELECT doc_id AS d,
                       unnest(string_split_regex({_DUCK_NORM}, '\\s+')) AS t
                FROM documents
              ) WHERE t <> '' GROUP BY t
            ) GROUP BY fd
          ) nt ON nt.d = pd.d
        )
        WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)
    """
    return linear_fit_oracle(src, "g", "ln", "lv")


def kn_surprisal(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_pred: Column | None = None,
) -> DataFrame:
    """Per-document interpolated KNESER-NEY bigram surprisal with discount
    d = 1/2 — the smoothing that actually wins LM evaluations (Chen &
    Goodman 1999): mass discounted from seen bigrams is redistributed via
    the CONTINUATION probability (how many distinct left-contexts a word
    appears in), so "francisco" (frequent but only after "san") stops
    stealing backoff mass from genuinely versatile words. The repo's
    stupid-backoff twin is :func:`bigram_surprisal`; this is the
    principled upgrade, and the pair is the LM-quality ablation a data
    curation pipeline runs.

    With d = 1/2 every probability is an exact rational over one common
    denominator:

        p(w2|w1) = [ (2·c2−1)₊·T + n1fwd(w1)·n1back(w2) ] / (2·c1(w1)·T)

    where c1(w1) = Σ_w2 c2(w1,w2) (so Σ_w2 p = 1 exactly), n1fwd/n1back
    are distinct-successor / distinct-predecessor counts, and T = distinct
    bigram types. Surprisal is the integer ``floor(log2(den div num))``
    device (len(bin(x))−1) — libm-free, cross-engine bit-exact; unknown-w1
    or unknown-w2 positions are skipped (frozen-model semantics).
    Output: ``(id, n_bigrams, avg_kn_bits)``.

    Overflow bound: (2·c2)·T < 2^63 — holds to ~3e9 tokens with a 1e9-type
    model; shard the vocabulary (hash on w1) past that.

    Scale: identical shape to :func:`bigram_surprisal` — one explode, one
    per-doc lead window, pair aggregation before any model join; the three
    model relations are vocabulary-sized and broadcast.
    """
    from pyspark.sql import Window

    toks = documents.select(
        F.col(id_col),
        F.posexplode(tokens(normalized(F.col(text_col)))).alias("__p", "t"),
    ).filter(F.col("t") != "")
    w = Window.partitionBy(id_col).orderBy("__p")
    pr = toks.select(
        F.col(id_col), F.col("t").alias("w1"), F.lead("t").over(w).alias("w2")
    ).filter(F.col("w2").isNotNull())
    pairs = (
        pr.groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()  # model derivation + scoring join
    )
    train_pairs = pairs if train_pred is None else pairs.filter(train_pred)
    c2 = train_pairs.groupBy("w1", "w2").agg(F.sum("tf").alias("c2")).localCheckpoint()
    fwd = c2.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n1fwd")
    )
    back = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n1back"))
    types = c2.agg(F.count(F.lit(1)).alias("tt"))
    flog2 = lambda x: F.length(F.bin(F.expr(x))) - 1
    scored = (
        pairs.join(c2, ["w1", "w2"], "left")
        .join(F.broadcast(fwd), "w1", "left")
        .join(F.broadcast(back), "w2", "left")
        .crossJoin(F.broadcast(types))
        .withColumn(
            "num",
            F.coalesce(
                F.greatest(F.lit(2) * F.col("c2") - 1, F.lit(0)), F.lit(0)
            )
            * F.col("tt")
            + F.col("n1fwd") * F.col("n1back"),
        )
        .withColumn("den", F.lit(2) * F.col("c1") * F.col("tt"))
        .filter(
            F.col("c1").isNotNull()
            & F.col("n1back").isNotNull()
            & (F.col("num") > 0)
        )
        .select(F.col(id_col), "tf", flog2("den div num").alias("__bits"))
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_bigrams"),
        (F.sum(F.col("tf") * F.col("__bits")).cast("double") / F.sum("tf")).alias(
            "avg_kn_bits"
        ),
    )


def kn_surprisal_oracle(train_where: str = "TRUE") -> str:
    """DuckDB twin of :func:`kn_surprisal`."""
    return f"""
        WITH tok AS MATERIALIZED (
          SELECT doc_id, t, p FROM (
            SELECT doc_id, unnest(arr) AS t, generate_subscripts(arr, 1) AS p
            FROM (SELECT doc_id, string_split_regex({_DUCK_NORM}, '\\s+') AS arr
                  FROM documents)
          ) WHERE t <> ''
        ), pr AS (
          SELECT doc_id, t AS w1,
                 LEAD(t) OVER (PARTITION BY doc_id ORDER BY p) AS w2
          FROM tok
        ), pairs AS MATERIALIZED (
          SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf
          FROM pr WHERE w2 IS NOT NULL GROUP BY doc_id, w1, w2
        ), c2 AS MATERIALIZED (
          SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c2 FROM pairs
          WHERE {train_where} GROUP BY w1, w2
        ), fwd AS MATERIALIZED (
          SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
                 CAST(COUNT(*) AS BIGINT) AS n1fwd
          FROM c2 GROUP BY w1
        ), back AS MATERIALIZED (
          SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1back FROM c2 GROUP BY w2
        ), tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM c2)
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
               CAST(CAST(SUM(tf * bits) AS BIGINT) AS DOUBLE) / SUM(tf)
                 AS avg_kn_bits
        FROM (
          SELECT pairs.doc_id, pairs.tf,
                 len(bin((2 * fwd.c1 * tt.tt) //
                     (COALESCE(greatest(2 * c2.c2 - 1, 0), 0) * tt.tt
                      + fwd.n1fwd * back.n1back))) - 1 AS bits,
                 COALESCE(greatest(2 * c2.c2 - 1, 0), 0) * tt.tt
                   + fwd.n1fwd * back.n1back AS num
          FROM pairs
          LEFT JOIN c2 ON pairs.w1 = c2.w1 AND pairs.w2 = c2.w2
          LEFT JOIN fwd ON pairs.w1 = fwd.w1
          LEFT JOIN back ON pairs.w2 = back.w2
          CROSS JOIN tt
          WHERE fwd.c1 IS NOT NULL AND back.n1back IS NOT NULL
        ) WHERE num > 0
        GROUP BY doc_id
    """


def rake_keywords(
    documents: DataFrame,
    lang: str = "en",
    max_phrase_len: int = 4,
    topn: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) — the PHRASE-level
    complement of the token-level TextRank: candidate phrases are the
    maximal stopword-free token runs, and a phrase scores by the sum of
    its words' ``degree/frequency`` ratios (words that keep company in
    long phrases beat frequent loners).

    Exact-integer scoring: per corpus word, ``freq`` = occurrences in
    candidates, ``deg`` = sum of hosting-phrase lengths; the word ratio
    quantizes to micro units by trunc-div and the phrase score is the
    exact BIGINT sum of its words' ratios. Top ``topn`` by
    (score DESC, phrase) — a total order.

    Stopword-island segmentation is one windowed cumulative sum over the
    exploded token sequence (island id = running count of stopword
    boundaries); phrases longer than ``max_phrase_len`` drop (RAKE's
    standard cap — unbounded runs are boilerplate, not keyphrases).

    Scale: explode + two hash aggregations (word-dim and phrase-dim) +
    one broadcast word-score join back onto phrase words. Vocabulary-
    sized relations everywhere after the explode.
    """
    from pyspark.sql import Window

    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    toks = documents.select(
        F.col(id_col).alias("d"),
        F.posexplode(tokens(normalized(F.col(text_col)))).alias("pos", "t"),
    ).filter(F.col("t") != "")
    w = Window.partitionBy("d").orderBy("pos")
    flagged = toks.withColumn(
        "stop", F.array_contains(stops, F.col("t")).cast("int")
    ).withColumn(
        "island",
        F.sum("stop").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    phrase_words = flagged.filter(F.col("stop") == 0).select(
        "d", "island", "pos", "t"
    )
    phrases = (
        phrase_words.groupBy("d", "island")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "t"))),
                    lambda s: s.t,
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("plen"),
        )
        .filter(F.col("plen") <= max_phrase_len)
    ).localCheckpoint(eager=False)  # word stats AND scoring read the words
    words = phrase_words.join(
        phrases.select("d", "island", "plen"), ["d", "island"]
    )
    word_stats = words.groupBy("t").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    ).withColumn("ratio_micro", F.expr("(deg * 1000000) div freq"))
    scored = (
        words.join(F.broadcast(word_stats.select("t", "ratio_micro")), "t")
        .groupBy("d", "island")
        .agg(F.sum("ratio_micro").alias("score_micro"))
        .join(phrases, ["d", "island"])
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.max("score_micro").alias("score_micro"),
        )
    )
    return scored.orderBy(F.col("score_micro").desc(), "phrase").limit(topn)


def rake_keywords_oracle(
    lang: str = "en",
    max_phrase_len: int = 4,
    topn: int = 20,
) -> str:
    """DuckDB twin of :func:`rake_keywords`."""
    stops = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"""
        WITH toks AS (
          SELECT doc_id AS d, pos, t FROM (
            SELECT doc_id,
                   generate_subscripts(string_split_regex({_DUCK_NORM},
                     '\\s+'), 1) AS pos,
                   unnest(string_split_regex({_DUCK_NORM}, '\\s+')) AS t
            FROM documents
          ) WHERE t <> ''
        ),
        flagged AS (
          SELECT d, pos, t,
                 CAST(t IN ({stops}) AS INTEGER) AS stop,
                 SUM(CAST(t IN ({stops}) AS INTEGER)) OVER (
                   PARTITION BY d ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS island
          FROM toks
        ),
        phrase_words AS MATERIALIZED (
          SELECT d, island, pos, t FROM flagged WHERE stop = 0
        ),
        phrases AS MATERIALIZED (
          SELECT d, island, string_agg(t, ' ' ORDER BY pos) AS phrase,
                 CAST(COUNT(*) AS BIGINT) AS plen
          FROM phrase_words GROUP BY 1, 2
          HAVING COUNT(*) <= {max_phrase_len}
        ),
        words AS (
          SELECT pw.* , p.plen
          FROM phrase_words pw JOIN phrases p USING (d, island)
        ),
        word_stats AS (
          SELECT t, (CAST(SUM(plen) AS BIGINT) * 1000000)
                      // CAST(COUNT(*) AS BIGINT) AS ratio_micro
          FROM words GROUP BY 1
        ),
        scored AS (
          SELECT w.d, w.island,
                 CAST(SUM(ws.ratio_micro) AS BIGINT) AS score_micro
          FROM words w JOIN word_stats ws USING (t)
          GROUP BY 1, 2
        )
        SELECT p.phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(MAX(s.score_micro) AS BIGINT) AS score_micro
        FROM scored s JOIN phrases p USING (d, island)
        GROUP BY 1
        ORDER BY score_micro DESC, phrase
        LIMIT {topn}
    """


def term_burstiness(
    documents: DataFrame,
    min_docs: int = 5,
    topn: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Term burstiness (Church & Gale 1995) — content words CLUMP (a
    document about sparks mentions them many times), function words
    spread evenly; the variance-to-mean ratio of per-document counts
    separates the two better than raw frequency, and feeds stopword
    discovery and keyword weighting.

    Exact integers: over ALL N docs (zero counts included via the
    complement), VMR = Var/mean closes to ``(N*Q - S^2) / (N*S)`` with
    S = sum of tf, Q = sum of tf^2 — one milli trunc-div per term.
    Terms in fewer than ``min_docs`` documents drop (singleton terms
    are trivially "bursty"). Top ``topn`` by (vmr_milli DESC, term).

    Scale: one (term, doc) tf aggregation, one term rollup — the
    standard inverted-index shuffle; N rides along as a broadcast
    scalar.
    """
    toks = documents.select(
        F.col(id_col).alias("d"),
        F.explode(tokens(normalized(F.col(text_col)))).alias("t"),
    ).filter(F.col("t") != "")
    n_docs = documents.select(
        F.count(F.lit(1)).cast("long").alias("n_corpus")
    )
    tf = toks.groupBy("t", "d").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").alias("s"),
        F.sum(F.col("tf") * F.col("tf")).alias("q"),
    )
    return (
        stats.filter(F.col("df") >= min_docs)
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col("t").alias("term"),
            "df",
            F.col("s").cast("long").alias("total_tf"),
            F.expr(
                "((n_corpus * q - s * s) * 1000) div (n_corpus * s)"
            ).alias("vmr_milli"),
        )
        .orderBy(F.col("vmr_milli").desc(), "term")
        .limit(topn)
    )


def term_burstiness_oracle(min_docs: int = 5, topn: int = 20) -> str:
    """DuckDB twin of :func:`term_burstiness`."""
    return f"""
        WITH toks AS (
          SELECT doc_id AS d, t FROM (
            SELECT doc_id, unnest(string_split_regex({_DUCK_NORM},
              '\\s+')) AS t
            FROM documents
          ) WHERE t <> ''
        ),
        tf AS (
          SELECT t, d, CAST(COUNT(*) AS BIGINT) AS tf
          FROM toks GROUP BY 1, 2
        ),
        stats AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS df,
                 CAST(SUM(tf) AS BIGINT) AS s,
                 CAST(SUM(tf*tf) AS BIGINT) AS q
          FROM tf GROUP BY 1
        )
        SELECT t AS term, df, s AS total_tf,
               (((SELECT CAST(COUNT(*) AS BIGINT) FROM documents) * q - s * s)
                * 1000)
                 // ((SELECT CAST(COUNT(*) AS BIGINT) FROM documents) * s)
                 AS vmr_milli
        FROM stats WHERE df >= {min_docs}
        ORDER BY vmr_milli DESC, term
        LIMIT {topn}
    """


def template_clusters(
    documents: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate-template detection (the C4-style "same frame, different
    filler" miner): documents OPENING with the same ``k`` normalized
    tokens form a template cluster — the shape mail merges, scraped
    listings, and generated spam take, which n-gram dedup under-catches
    when the filler diverges. Per cluster, the distinct-ending count
    diagnoses how templated the frame is: ``n_suffixes`` << ``n_docs``
    means the documents also CLOSE alike (a full frame), ``n_suffixes``
    = ``n_docs`` means only the opening is boilerplate. Docs with fewer
    than ``2k`` tokens are skipped (head and tail would overlap).

    Output per cluster (>= 2 docs): ``(prefix_key, n_docs, n_suffixes,
    min_doc_id, total_chars)``.

    Scale: one projection (head/tail slices are per-row array ops) +
    one hash aggregation on the prefix key. No joins.
    """
    toks = F.filter(tokens(normalized(F.col(text_col))), lambda t: t != "")
    base = documents.select(
        F.col(id_col).alias("d"),
        F.col("n_chars"),
        toks.alias("w"),
    ).filter(F.size("w") >= 2 * k)
    keyed = base.select(
        "d",
        "n_chars",
        F.concat_ws(" ", F.slice("w", 1, k)).alias("prefix_key"),
        F.concat_ws(" ", F.slice("w", -k, k)).alias("suffix_key"),
    )
    return (
        keyed.groupBy("prefix_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("suffix_key").cast("long").alias("n_suffixes"),
            F.min("d").cast("long").alias("min_doc_id"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def template_clusters_oracle(k: int = 8) -> str:
    """DuckDB twin of :func:`template_clusters` (documents table)."""
    return f"""
        WITH base AS (
          SELECT doc_id AS d, n_chars,
                 list_filter(string_split_regex({_DUCK_NORM}, '\\s+'),
                             t -> t <> '') AS w
          FROM documents
        ),
        keyed AS (
          SELECT d, n_chars,
                 array_to_string(w[1:{k}], ' ') AS prefix_key,
                 array_to_string(w[-{k}:], ' ') AS suffix_key
          FROM base WHERE len(w) >= {2 * k}
        )
        SELECT prefix_key, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT suffix_key) AS BIGINT) AS n_suffixes,
               CAST(MIN(d) AS BIGINT) AS min_doc_id,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM keyed GROUP BY 1
        HAVING COUNT(*) >= 2
    """


def prefix_cache_stats(
    documents: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Serving prefix-cache potential: how much of the corpus shares a
    ``k``-token prefix with another document — the number an LLM-serving
    prefix cache (or a prompt-dedup layer) would actually hit. ``hit``
    counts every doc beyond the first in its prefix group.

    Output one row: ``(k, n_docs, n_prefixes, n_docs_in_shared,
    n_shared_prefixes, hit_rate_micro)`` with
    ``hit_rate_micro = ((n_docs - n_prefixes) * 1e6) div n_docs``.

    Scale: one projection + one hash aggregation + one rollup.
    """
    toks = F.filter(tokens(normalized(F.col(text_col))), lambda t: t != "")
    pre = documents.select(
        F.concat_ws(" ", F.slice(toks, 1, k)).alias("p")
    ).filter(F.length("p") > 0)
    per = pre.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    return per.agg(
        F.lit(k).cast("long").alias("k"),
        F.sum("c").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_prefixes"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_docs_in_shared"),
        F.sum(F.when(F.col("c") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_shared_prefixes"),
    ).withColumn(
        "hit_rate_micro",
        F.expr("((n_docs - n_prefixes) * 1000000) div n_docs"),
    )


def prefix_cache_stats_oracle(k: int = 8) -> str:
    """DuckDB twin of :func:`prefix_cache_stats` (documents table)."""
    return f"""
        WITH pre AS (
          SELECT array_to_string(
                   list_filter(string_split_regex({_DUCK_NORM}, '\\s+'),
                               t -> t <> '')[1:{k}], ' ') AS p
          FROM documents
        ),
        per AS (
          SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM pre
          WHERE len(p) > 0 GROUP BY p
        )
        SELECT CAST({k} AS BIGINT) AS k,
               CAST(SUM(c) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_prefixes,
               CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
                 AS n_docs_in_shared,
               CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_shared_prefixes,
               ((CAST(SUM(c) AS BIGINT) - CAST(COUNT(*) AS BIGINT)) * 1000000)
                 // CAST(SUM(c) AS BIGINT) AS hit_rate_micro
        FROM per
    """


def compression_signal(
    documents: DataFrame,
    level: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """zlib compression-ratio quality signal — the classic redundancy
    gate (used alongside Gopher/C4 rules): templated, boilerplate or
    keyword-stuffed text DEFLATEs far below natural prose, so a low
    ``ratio_milli`` flags low-information documents and a very high one
    flags near-random payloads (both are curation drop candidates).

    Output per doc: ``n_bytes`` (UTF-8), ``n_compressed`` (zlib at
    ``level``), ``ratio_milli = 1000 * n_compressed div n_bytes``.

    NO DuckDB twin: DEFLATE isn't SQL-expressible, so this row is
    rows-only at the driver gate (the one such row in the registry —
    everything else is oracle-paired); tests/test_quality.py pins exact
    values against a direct zlib computation on the same parquet, and
    the output is deterministic for a fixed zlib build + level.

    Scale: Arrow-batched ``mapInPandas`` (zlib releases the GIL; C-speed
    per batch), hash-spread into ``defaultParallelism`` partitions first
    (explicit count — AQE never coalesces REPARTITION_BY_NUM; DESIGN.md
    single-file-scan rule). State-free, embarrassingly parallel.
    """
    import zlib

    spark = documents.sparkSession
    nparts = spark.sparkContext.defaultParallelism

    def score(batches):
        import pandas as pd

        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            n_bytes = raw.str.len().astype("int64")
            n_comp = raw.map(lambda b: len(zlib.compress(b, level))).astype(
                "int64"
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n_bytes,
                    "n_compressed": n_comp,
                    "ratio_milli": (n_comp * 1000) // n_bytes.clip(lower=1),
                }
            )

    return (
        documents.select(id_col, text_col)
        .repartition(nparts, F.col(id_col))
        .mapInPandas(
            score,
            schema=(
                "doc_id long, n_bytes long, n_compressed long, "
                "ratio_milli long"
            ),
        )
    )
