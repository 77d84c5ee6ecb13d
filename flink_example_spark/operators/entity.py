"""Entity resolution (record linkage) — canonicalizing a dirty registry.

The classic master-data primitive a curation pipeline runs over scraped
metadata (author/publisher/domain registries): records whose NAMES differ
by typos are the same entity and must be collapsed to one canonical id
before joins. Reference parity: the reference engine (kerinin/
flink-example, App.java:96-150) supplies grouped aggregation and joins;
resolution is those primitives composed with the repo's proven SymSpell
deletion-neighborhood join (operators/dedup.py::fuzzy_word_pairs) and
star-contraction connected components (operators/dedup.py::
duplicate_clusters).

Scale shape (the order of operations IS the 100 TB story):

1. EXACT grouping first — one hash aggregate collapses identical
   normalized names, so the fuzzy stage runs over DISTINCT names only
   (vocabulary-sized, not record-sized).
2. SymSpell delete-neighborhood self-join over distinct names — perfect
   recall at edit distance <= max_dist (the alignment argument in
   fuzzy_word_pairs' docstring), O(names x len) candidate keys, never
   O(names^2) pairs; levenshtein verify trims same-variant non-neighbors.
3. Connected components by alternating star contraction — O(log^2)
   rounds, nothing edge-sized on the driver.
4. Canonical mapping broadcast back onto the record-sized relation.

Engine portability: levenshtein is the classic integer DP in both
engines; ids/counts are BIGINTs; no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', ' '),"
    " ' +', ' '))"
)


def _normalized(col: str):
    return F.expr(_NORM_SQL.format(c=col))


def _expand_deletes(df: DataFrame, col: str) -> DataFrame:
    """Each row -> itself (i=0) plus every delete-one-character variant —
    the SymSpell neighborhood, generated with codegen explode+substring."""
    others = [c for c in df.columns if c != col]
    return df.select(
        *others,
        F.explode(F.sequence(F.lit(0), F.length(col))).alias("__i"),
        F.col(col),
    ).select(
        *others,
        F.when(F.col("__i") == 0, F.col(col))
        .otherwise(
            F.concat(
                F.substring(F.col(col), 1, F.col("__i") - F.lit(1)),
                F.substring(
                    F.col(col), F.col("__i") + F.lit(1), F.lit(1_000_000)
                ),
            )
        )
        .alias(col),
    )


def _edit_pairs(g: DataFrame, max_dist: int) -> DataFrame:
    """SymSpell candidate generation + levenshtein verify over a
    (nm, rep_id) relation: rep-id pairs (doc_a < doc_b) of names within
    the edit distance. Shared by both edit-distance resolvers."""
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    # expand max_dist times on a variant column seeded with the name itself
    var = g.select(F.col("nm"), F.col("rep_id"), F.col("nm").alias("__v"))
    for _ in range(max_dist):
        var = _expand_deletes(var, "__v")
    var = var.distinct()
    cand = (
        var.select(F.col("nm").alias("na"), F.col("rep_id").alias("ra"), "__v")
        .join(
            var.select(F.col("nm").alias("nb"), F.col("rep_id").alias("rb"), "__v"),
            "__v",
        )
        .filter(F.col("na") < F.col("nb"))
        .select("na", "nb", "ra", "rb")
        .distinct()
        .filter(F.levenshtein("na", "nb") <= max_dist)
    )
    return cand.select(
        F.least("ra", "rb").alias("doc_a"), F.greatest("ra", "rb").alias("doc_b")
    ).distinct()


def resolve_entities(
    records: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    max_dist: int = 1,
) -> DataFrame:
    """Entity table from a dirty registry: one row per resolved entity —
    ``(canonical_id, canonical_name, n_variants, n_records)`` where
    canonical_id is the minimum record id transitively reachable through
    name matches (exact after normalization, or levenshtein <= max_dist).
    """
    g = (
        records.select(
            F.col(id_col).alias("__id"), _normalized(name_col).alias("nm")
        )
        .filter(F.col("nm") != "")
        .groupBy("nm")
        .agg(F.min("__id").alias("rep_id"), F.count(F.lit(1)).alias("n_rec"))
        .localCheckpoint()  # read by the expand join (twice) and the final agg
    )
    return _entity_table(g, _edit_pairs(g, max_dist))


def record_links(
    records: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    max_dist: int = 1,
) -> DataFrame:
    """Per-record canonical assignment ``(id, canonical_id)`` — the
    broadcast-back mapping stage (what a GDPR blast-radius or golden-record
    join consumes). Recomputes the entity table's cluster map and joins it
    onto the record-sized relation by normalized name."""
    from flink_example_spark.operators.dedup import duplicate_clusters

    g = (
        records.select(
            F.col(id_col).alias("__id"), _normalized(name_col).alias("nm")
        )
        .filter(F.col("nm") != "")
    )
    reps = g.groupBy("nm").agg(F.min("__id").alias("rep_id")).localCheckpoint()
    clusters = duplicate_clusters(_edit_pairs(reps, max_dist), id_col="doc_id")
    cmap = reps.join(
        clusters.select(F.col("doc_id").alias("rep_id"), "cluster_id"),
        "rep_id",
        "left",
    ).select("nm", F.coalesce("cluster_id", "rep_id").alias("cid"))
    return g.join(F.broadcast(cmap), "nm").select(
        F.col("__id").cast("long").alias(id_col),
        F.col("cid").cast("long").alias("canonical_id"),
    )


def dirty_registry(part: DataFrame) -> DataFrame:
    """Deterministic dirty registry from the part table: every 7th record
    (mod 3) duplicates its name's last character (an insertion typo),
    every 7th (mod 5) drops it (a deletion) — the OCR/keyboard noise model
    the resolver must undo. Pure SQL CASE, identical text in DuckDB."""
    return part.select(
        F.col("p_partkey").cast("long").alias("id"),
        F.expr(
            "CASE WHEN p_partkey % 7 = 3 THEN concat(p_name,"
            " substring(p_name, length(p_name), 1))"
            " WHEN p_partkey % 7 = 5 THEN substring(p_name, 1,"
            " length(p_name) - 1)"
            " ELSE p_name END"
        ).alias("name"),
    )


DIRTY_REGISTRY_SQL = """(
    SELECT CAST(p_partkey AS BIGINT) AS id,
           CASE WHEN p_partkey % 7 = 3 THEN p_name ||
                  substring(p_name, length(p_name), 1)
                WHEN p_partkey % 7 = 5 THEN substring(p_name, 1,
                  length(p_name) - 1)
                ELSE p_name END AS name
    FROM part
)"""

_DUCK_NORM_NAME = (
    "trim(regexp_replace(regexp_replace(lower(name), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)

_CLOSURE = """
        edges AS (
          SELECT ra AS a, rb AS b FROM pairs
          UNION SELECT rb, ra FROM pairs
        ),
        reach(id, r) AS (
          SELECT a, a FROM edges
          UNION SELECT a, b FROM edges
          UNION SELECT reach.id, edges.b FROM reach JOIN edges ON reach.r = edges.a
        ),
        cl AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
        ent AS (
          SELECT g.nm, g.rep_id, g.n_rec,
                 COALESCE(cl.cluster_id, g.rep_id) AS cid
          FROM g LEFT JOIN cl ON cl.id = g.rep_id
        )"""


def resolve_entities_oracle(source: str = DIRTY_REGISTRY_SQL, max_dist: int = 1) -> str:
    """Brute-force DuckDB twin of :func:`resolve_entities` — exact, because
    the deletion-neighborhood join has perfect recall at the configured
    distance (fuzzy_word_pairs' alignment argument)."""
    return f"""
        WITH RECURSIVE g AS MATERIALIZED (
          SELECT nm, MIN(id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_rec
          FROM (SELECT id, {_DUCK_NORM_NAME} AS nm FROM {source})
          WHERE nm <> '' GROUP BY nm
        ),
        pairs AS (
          SELECT least(a.rep_id, b.rep_id) AS ra,
                 greatest(a.rep_id, b.rep_id) AS rb
          FROM g a JOIN g b
            ON a.nm < b.nm AND abs(len(a.nm) - len(b.nm)) <= {max_dist}
          WHERE levenshtein(a.nm, b.nm) <= {max_dist}
        ),{_CLOSURE}
        SELECT ag.cid AS canonical_id, cn.nm AS canonical_name,
               ag.n_variants, ag.n_records
        FROM (
          SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_variants,
                 CAST(SUM(n_rec) AS BIGINT) AS n_records
          FROM ent GROUP BY cid
        ) ag JOIN g cn ON cn.rep_id = ag.cid
    """


def record_links_oracle(source: str = DIRTY_REGISTRY_SQL, max_dist: int = 1) -> str:
    """Brute-force DuckDB twin of :func:`record_links`."""
    return f"""
        WITH RECURSIVE raw AS MATERIALIZED (
          SELECT id, {_DUCK_NORM_NAME} AS nm FROM {source}
        ),
        g AS MATERIALIZED (
          SELECT nm, MIN(id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_rec
          FROM raw WHERE nm <> '' GROUP BY nm
        ),
        pairs AS (
          SELECT least(a.rep_id, b.rep_id) AS ra,
                 greatest(a.rep_id, b.rep_id) AS rb
          FROM g a JOIN g b
            ON a.nm < b.nm AND abs(len(a.nm) - len(b.nm)) <= {max_dist}
          WHERE levenshtein(a.nm, b.nm) <= {max_dist}
        ),{_CLOSURE}
        SELECT CAST(raw.id AS BIGINT) AS id,
               CAST(ent.cid AS BIGINT) AS canonical_id
        FROM raw JOIN ent ON ent.nm = raw.nm
    """


def _entity_table(g: DataFrame, pairs: DataFrame) -> DataFrame:
    """Shared tail of the resolvers: star-contraction components over rep-id
    pairs, canonical min-id survivor, per-entity rollup."""
    from flink_example_spark.operators.dedup import duplicate_clusters

    clusters = duplicate_clusters(pairs, id_col="doc_id")
    ent = g.join(
        clusters.select(F.col("doc_id").alias("rep_id"), "cluster_id"),
        "rep_id",
        "left",
    ).select(
        "nm", "rep_id", "n_rec", F.coalesce("cluster_id", "rep_id").alias("cid")
    )
    agg = ent.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_variants"), F.sum("n_rec").alias("n_records")
    )
    return agg.join(
        g.select(F.col("rep_id").alias("cid"), F.col("nm").alias("canonical_name")),
        "cid",
    ).select(
        F.col("cid").cast("long").alias("canonical_id"),
        "canonical_name",
        F.col("n_variants").cast("long").alias("n_variants"),
        F.col("n_records").cast("long").alias("n_records"),
    )


def resolve_entities_tokens(
    records: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """Token-set entity resolution: names match when their TOKEN-SET
    Jaccard is >= threshold — the abbreviation/reorder-robust complement
    of :func:`resolve_entities` (edit distance misses "acme corp" vs
    "acme" entirely; token overlap catches truncated and re-ordered
    names). Same scale order: exact-group first, then the EXACT PPJoin
    prefix-filtered similarity join (dedup.ppjoin_pairs — rare-first
    prefix ordering, integer cross-multiplied gates, zero false
    negatives) over the DISTINCT-name relation only, then
    star-contraction components and the canonical min-id survivor.
    """
    from flink_example_spark.operators.dedup import ppjoin_pairs

    g = (
        records.select(
            F.col(id_col).alias("__id"), _normalized(name_col).alias("nm")
        )
        .filter(F.col("nm") != "")
        .groupBy("nm")
        .agg(F.min("__id").alias("rep_id"), F.count(F.lit(1)).alias("n_rec"))
        .localCheckpoint()
    )
    pairs = ppjoin_pairs(
        g.select("rep_id", "nm"),
        threshold_num=threshold_num,
        threshold_den=threshold_den,
        id_col="rep_id",
        text_col="nm",
    ).select(
        F.least("id_a", "id_b").alias("doc_a"),
        F.greatest("id_a", "id_b").alias("doc_b"),
    ).distinct()
    return _entity_table(g, pairs)


ABBREV_REGISTRY_SQL = """(
    SELECT CAST(p_partkey AS BIGINT) AS id,
           CASE WHEN p_partkey % 5 = 2
                THEN regexp_replace(p_name, ' [^ ]+$', '')
                ELSE p_name END AS name
    FROM part
)"""


def abbrev_registry(part: DataFrame) -> DataFrame:
    """Deterministic abbreviation-dirty registry: every 5th record (mod 2)
    drops its name's last token — the truncation noise token-set matching
    must undo (and edit distance cannot). Identical SQL text in DuckDB."""
    return part.select(
        F.col("p_partkey").cast("long").alias("id"),
        F.expr(
            "CASE WHEN p_partkey % 5 = 2"
            " THEN regexp_replace(p_name, ' [^ ]+$', '')"
            " ELSE p_name END"
        ).alias("name"),
    )


def resolve_entities_tokens_oracle(
    source: str = ABBREV_REGISTRY_SQL,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> str:
    """Brute-force DuckDB twin of :func:`resolve_entities_tokens` — exact
    because PPJoin's prefix filter has zero false negatives, so the
    candidate-join result EQUALS all-pairs Jaccard at the threshold."""
    return f"""
        WITH RECURSIVE g AS MATERIALIZED (
          SELECT nm, MIN(id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_rec
          FROM (SELECT id, {_DUCK_NORM_NAME} AS nm FROM {source})
          WHERE nm <> '' GROUP BY nm
        ),
        ts AS MATERIALIZED (
          SELECT rep_id, nm,
                 list_distinct(string_split_regex(nm, ' +')) AS tok
          FROM g
        ),
        pairs AS (
          SELECT least(a.rep_id, b.rep_id) AS ra,
                 greatest(a.rep_id, b.rep_id) AS rb
          FROM ts a JOIN ts b ON a.nm < b.nm
          WHERE {threshold_den} * len(list_intersect(a.tok, b.tok))
                >= {threshold_num}
                   * (len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok)))
            AND len(list_intersect(a.tok, b.tok)) > 0
        ),{_CLOSURE}
        SELECT ag.cid AS canonical_id, cn.nm AS canonical_name,
               ag.n_variants, ag.n_records
        FROM (
          SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_variants,
                 CAST(SUM(n_rec) AS BIGINT) AS n_records
          FROM ent GROUP BY cid
        ) ag JOIN g cn ON cn.rep_id = ag.cid
    """


def resolve_entities_weighted(
    records: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """TF-IDF-WEIGHTED token-set entity resolution: names match when their
    weighted Jaccard (rarity weight ``length(bin(N div df))`` per token)
    is >= threshold — the long-name matcher: a shared rare brand token
    outweighs any amount of stopword overlap, where the unweighted
    :func:`resolve_entities_tokens` dilutes it. Same scale order:
    exact-group first, the EXACT weighted-PPJoin prefix join
    (dedup.ppjoin_weighted_pairs) over the DISTINCT-name relation only,
    then star-contraction components and the canonical min-id survivor.
    """
    from flink_example_spark.operators.dedup import ppjoin_weighted_pairs

    g = (
        records.select(
            F.col(id_col).alias("__id"), _normalized(name_col).alias("nm")
        )
        .filter(F.col("nm") != "")
        .groupBy("nm")
        .agg(F.min("__id").alias("rep_id"), F.count(F.lit(1)).alias("n_rec"))
        .localCheckpoint()
    )
    pairs = ppjoin_weighted_pairs(
        g.select("rep_id", "nm"),
        threshold_num=threshold_num,
        threshold_den=threshold_den,
        id_col="rep_id",
        text_col="nm",
    ).select(
        F.least("id_a", "id_b").alias("doc_a"),
        F.greatest("id_a", "id_b").alias("doc_b"),
    ).distinct()
    return _entity_table(g, pairs)


def resolve_entities_weighted_oracle(
    source: str = ABBREV_REGISTRY_SQL,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> str:
    """Brute-force DuckDB twin of :func:`resolve_entities_weighted` —
    exact because the weighted prefix filter has zero false negatives
    (ppjoin_weighted_pairs' docstring argument), so the candidate join
    EQUALS all-pairs weighted Jaccard at the threshold."""
    tn, td = threshold_num, threshold_den
    return f"""
        WITH RECURSIVE g AS MATERIALIZED (
          SELECT nm, MIN(id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_rec
          FROM (SELECT id, {_DUCK_NORM_NAME} AS nm FROM {source})
          WHERE nm <> '' GROUP BY nm
        ),
        dt AS MATERIALIZED (
          SELECT DISTINCT rep_id AS d, t FROM (
            SELECT rep_id, unnest(string_split_regex(nm, ' +')) AS t FROM g
          ) WHERE t <> ''
        ),
        tot AS (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS n_docs FROM dt),
        wts AS MATERIALIZED (
          SELECT t, CAST(length(bin(n_docs // df)) AS BIGINT) AS w
          FROM (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY t), tot
        ),
        ws AS MATERIALIZED (
          SELECT d, CAST(SUM(w) AS BIGINT) AS tw
          FROM dt JOIN wts USING (t) GROUP BY d
        ),
        iw AS MATERIALIZED (
          SELECT a.d AS da, b.d AS db, CAST(SUM(wts.w) AS BIGINT) AS inter_w
          FROM dt a JOIN dt b ON a.t = b.t AND a.d < b.d
          JOIN wts ON wts.t = a.t
          GROUP BY a.d, b.d
        ),
        pairs AS (
          SELECT least(da, db) AS ra, greatest(da, db) AS rb
          FROM iw JOIN ws wa ON wa.d = da JOIN ws wb ON wb.d = db
          WHERE {td} * inter_w >= {tn} * (wa.tw + wb.tw - inter_w)
        ),{_CLOSURE}
        SELECT ag.cid AS canonical_id, cn.nm AS canonical_name,
               ag.n_variants, ag.n_records
        FROM (
          SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_variants,
                 CAST(SUM(n_rec) AS BIGINT) AS n_records
          FROM ent GROUP BY cid
        ) ag JOIN g cn ON cn.rep_id = ag.cid
    """


_INV = 999_999_999_999  # count inversion for the modal-value argmax key


def golden_records(
    attrs: DataFrame,
    links: DataFrame,
    id_col: str = "id",
    cat_col: str = "cat",
    num_col: str = "num",
) -> DataFrame:
    """Golden-record survivorship — the step after resolution in an MDM
    pipeline: merge every record's attributes into one canonical row per
    entity. Categorical column -> the MODAL value (most frequent across
    the entity's records, ties to the smallest value — the repo's
    zero-padded ``(INV - count) || value`` string-min idiom, a
    streaming-able monoid); numeric column -> min/max envelope
    (comparison-only, so raw doubles are portable).

    ``links`` is :func:`record_links` output (id, canonical_id). Scale:
    one record-sized equi-join + two key-sized aggregations.

    Output: ``(canonical_id, n_records, top_cat, top_cat_count, num_min,
    num_max)``.
    """
    j = attrs.select(
        F.col(id_col).alias("__id"),
        F.col(cat_col).alias("__cat"),
        F.col(num_col).alias("__num"),
    ).join(links.select(F.col(id_col).alias("__id"), "canonical_id"), "__id")
    j = j.localCheckpoint()  # consumed by the modal agg AND the envelope agg
    modal = (
        j.groupBy("canonical_id", "__cat")
        .agg(F.count(F.lit(1)).alias("__c"))
        .select(
            "canonical_id",
            F.concat(
                F.lpad((F.lit(_INV) - F.col("__c")).cast("string"), 12, "0"),
                F.col("__cat"),
            ).alias("__k"),
        )
        .groupBy("canonical_id")
        .agg(F.min("__k").alias("__k"))
        .select(
            "canonical_id",
            F.substring("__k", 13, 1_000_000).alias("top_cat"),
            (F.lit(_INV) - F.substring("__k", 1, 12).cast("bigint")).alias(
                "top_cat_count"
            ),
        )
    )
    env = j.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.min("__num").alias("num_min"),
        F.max("__num").alias("num_max"),
    )
    return env.join(modal, "canonical_id").select(
        F.col("canonical_id").cast("long").alias("canonical_id"),
        "n_records",
        "top_cat",
        "top_cat_count",
        "num_min",
        "num_max",
    )


def golden_records_oracle(
    links_sql: str,
    attrs_sql: str,
    id_col: str = "id",
    cat_col: str = "cat",
    num_col: str = "num",
) -> str:
    """DuckDB twin of :func:`golden_records`. ``links_sql``: a full SELECT
    producing (id, canonical_id); ``attrs_sql``: relation with id/cat/num."""
    return f"""
        WITH links AS MATERIALIZED ({links_sql}),
        j AS MATERIALIZED (
          SELECT links.canonical_id, a.{cat_col} AS cat, a.{num_col} AS num
          FROM ({attrs_sql}) a JOIN links ON links.{id_col} = a.{id_col}
        ),
        modal AS (
          SELECT canonical_id,
                 substr(MIN(lpad(CAST({_INV} - c AS VARCHAR), 12, '0') || cat),
                        13) AS top_cat,
                 {_INV} - CAST(substr(MIN(
                   lpad(CAST({_INV} - c AS VARCHAR), 12, '0') || cat), 1, 12)
                   AS BIGINT) AS top_cat_count
          FROM (
            SELECT canonical_id, cat, CAST(COUNT(*) AS BIGINT) AS c
            FROM j GROUP BY 1, 2
          ) GROUP BY canonical_id
        ),
        env AS (
          SELECT canonical_id, CAST(COUNT(*) AS BIGINT) AS n_records,
                 MIN(num) AS num_min, MAX(num) AS num_max
          FROM j GROUP BY canonical_id
        )
        SELECT CAST(env.canonical_id AS BIGINT) AS canonical_id, n_records,
               top_cat, top_cat_count, num_min, num_max
        FROM env JOIN modal USING (canonical_id)
    """


def canonical_name_map(
    records: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    max_dist: int = 1,
) -> DataFrame:
    """The frozen serving artifact of a resolution run: (nm, canonical_id)
    for every distinct normalized name — what :func:`incremental_links`
    probes. Same pipeline as :func:`record_links` up to the name level."""
    from flink_example_spark.operators.dedup import duplicate_clusters

    reps = (
        records.select(
            F.col(id_col).alias("__id"), _normalized(name_col).alias("nm")
        )
        .filter(F.col("nm") != "")
        .groupBy("nm")
        .agg(F.min("__id").alias("rep_id"))
        .localCheckpoint()
    )
    clusters = duplicate_clusters(_edit_pairs(reps, max_dist), id_col="doc_id")
    return reps.join(
        clusters.select(F.col("doc_id").alias("rep_id"), "cluster_id"),
        "rep_id",
        "left",
    ).select("nm", F.coalesce("cluster_id", "rep_id").alias("canonical_id"))


def incremental_links(
    new_records: DataFrame,
    known: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    max_dist: int = 1,
) -> DataFrame:
    """INCREMENTAL resolution — the serving path: assign arriving records
    to a FROZEN entity table without re-clustering the corpus. Priority:
    exact normalized-name hit, else SymSpell fuzzy probe (minimum
    canonical id among names within ``max_dist`` — deterministic), else a
    NEW entity anchored at the name's minimum arriving id.

    ``known`` is :func:`canonical_name_map` output. Scale: the probe is
    one broadcast-able equi-join on delete-variants (both sides
    vocabulary-sized); arriving records never trigger clustering. The
    trade vs re-resolving from scratch is the textbook one: two new
    records that match each other but nothing known become TWO new
    entities until the next full re-resolution.

    Output per new record: ``(id, canonical_id, method)`` with method in
    ('exact', 'fuzzy', 'new').
    """
    raw = new_records.select(
        F.col(id_col).alias("__id"), _normalized(name_col).alias("nm")
    ).filter(F.col("nm") != "")
    nn = raw.groupBy("nm").agg(F.min("__id").alias("nid")).localCheckpoint()
    exact = nn.join(known, "nm").select("nm", "canonical_id")
    open_names = nn.join(exact.select("nm"), "nm", "left_anti")
    ka = known.select("nm", "canonical_id", F.col("nm").alias("__v"))
    na = open_names.select("nm", F.col("nm").alias("__v"))
    for _ in range(max_dist):
        ka = _expand_deletes(ka, "__v")
        na = _expand_deletes(na, "__v")
    fuzzy = (
        na.distinct()
        .join(ka.select(F.col("nm").alias("km"), "canonical_id", "__v").distinct(), "__v")
        .filter(F.levenshtein("nm", "km") <= max_dist)
        .groupBy("nm")
        .agg(F.min("canonical_id").alias("canonical_id"))
    )
    assigned = (
        exact.select("nm", "canonical_id", F.lit("exact").alias("method"))
        .unionByName(
            fuzzy.select("nm", "canonical_id", F.lit("fuzzy").alias("method"))
        )
        .unionByName(
            open_names.join(fuzzy.select("nm"), "nm", "left_anti")
            .select(
                "nm",
                F.col("nid").alias("canonical_id"),
                F.lit("new").alias("method"),
            )
        )
    )
    return raw.join(F.broadcast(assigned), "nm").select(
        F.col("__id").cast("long").alias(id_col),
        F.col("canonical_id").cast("long").alias("canonical_id"),
        "method",
    )


def incremental_links_oracle(
    base_source: str,
    new_source: str,
    max_dist: int = 1,
) -> str:
    """Brute-force DuckDB twin of :func:`incremental_links` with ``known``
    = the closure over ``base_source`` (exact because the SymSpell probe
    has perfect recall at the distance)."""
    return f"""
        WITH RECURSIVE g AS MATERIALIZED (
          SELECT nm, MIN(id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_rec
          FROM (SELECT id, {_DUCK_NORM_NAME} AS nm FROM {base_source})
          WHERE nm <> '' GROUP BY nm
        ),
        pairs AS (
          SELECT least(a.rep_id, b.rep_id) AS ra,
                 greatest(a.rep_id, b.rep_id) AS rb
          FROM g a JOIN g b
            ON a.nm < b.nm AND abs(len(a.nm) - len(b.nm)) <= {max_dist}
          WHERE levenshtein(a.nm, b.nm) <= {max_dist}
        ),{_CLOSURE}
        , cmap AS MATERIALIZED (SELECT nm, cid AS canonical_id FROM ent),
        raw AS MATERIALIZED (
          SELECT id, {_DUCK_NORM_NAME} AS nm FROM {new_source}
        ),
        nn AS MATERIALIZED (
          SELECT nm, MIN(id) AS nid FROM raw WHERE nm <> '' GROUP BY nm
        ),
        exact AS MATERIALIZED (
          SELECT nn.nm, cmap.canonical_id FROM nn JOIN cmap USING (nm)
        ),
        fuzzy AS MATERIALIZED (
          SELECT nn.nm, MIN(c.canonical_id) AS canonical_id
          FROM nn JOIN cmap c
            ON abs(len(nn.nm) - len(c.nm)) <= {max_dist}
           AND levenshtein(nn.nm, c.nm) <= {max_dist}
          WHERE nn.nm NOT IN (SELECT nm FROM exact)
          GROUP BY nn.nm
        ),
        assigned AS (
          SELECT nm, canonical_id, 'exact' AS method FROM exact
          UNION ALL
          SELECT nm, canonical_id, 'fuzzy' FROM fuzzy
          UNION ALL
          SELECT nn.nm, nn.nid, 'new' FROM nn
          WHERE nn.nm NOT IN (SELECT nm FROM exact)
            AND nn.nm NOT IN (SELECT nm FROM fuzzy)
        )
        SELECT CAST(raw.id AS BIGINT) AS id,
               CAST(assigned.canonical_id AS BIGINT) AS canonical_id,
               method
        FROM raw JOIN assigned ON assigned.nm = raw.nm
    """


_SOUNDEX_FROM = "abcdefghijklmnopqrstuvwxyz"
_SOUNDEX_TO = "01230120022455012623010202"


def _soundex_expr(norm_expr: str, dialect: str) -> str:
    """American-Soundex code of a normalized (lowercase a-z0-9 space) name,
    spaces removed, as ONE SQL expression — built twice from the same
    template so Spark and DuckDB compute identical codes. Steps: map
    letters to digit classes (vowels/h/w/y -> 0), collapse runs of the
    same digit, drop the first letter's own code, strip zeros, first
    letter + 3 digits zero-padded. Digits in the name map to themselves
    past '6' only through 0-collapse (they are rare in registry names and
    hash consistently either way)."""
    g = ", 'g'" if dialect == "duckdb" else ""
    compact = f"replace({norm_expr}, ' ', '')"
    digits = f"translate({compact}, '{_SOUNDEX_FROM}', '{_SOUNDEX_TO}')"
    collapsed = digits
    for d in "0123456":
        collapsed = f"regexp_replace({collapsed}, '{d}{{2,}}', '{d}'{g})"
    tail = f"replace(substring({collapsed}, 2), '0', '')"
    return (
        f"CASE WHEN {compact} = '' THEN '' ELSE "
        f"upper(substring({compact}, 1, 1)) || rpad(substring({tail}, 1, 3), 3, '0')"
        " END"
    )


def phonetic_links(
    records: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    max_dist: int = 2,
) -> DataFrame:
    """Phonetic blocking matcher: names that sound alike (equal Soundex
    code) and verify at ``levenshtein <= max_dist`` — the classic
    complement to the SymSpell delete-neighborhood (which misses phonetic
    substitutions like widget/wydget that are cheap for a typist's ear).

    Output: one row per verified pair ``(code, rep_a, rep_b, dist)`` with
    rep ids the min record id per distinct normalized name, rep_a < rep_b.

    Scale: codes are a hash-partition key; each block is tiny by
    construction (4-char code space), so the within-block pair join is
    bounded — the standard MDM blocking posture. A pathological block
    (all names alike) is capped the same way ppjoin's prefix filter is:
    add a length band on the join (here, |len(a)-len(b)| <= max_dist).
    """
    g = (
        records.select(F.col(id_col).alias("__id"), _normalized(name_col).alias("nm"))
        .filter(F.col("nm") != "")
        .groupBy("nm")
        .agg(F.min("__id").alias("rep_id"))
        .withColumn("code", F.expr(_soundex_expr("nm", "spark")))
        .localCheckpoint()  # both sides of the block join
    )
    a, b = g.alias("a"), g.alias("b")
    return (
        a.join(
            b,
            (F.col("a.code") == F.col("b.code"))
            & (F.col("a.nm") < F.col("b.nm"))
            & (
                F.abs(F.length("a.nm") - F.length("b.nm")) <= max_dist
            ),
        )
        .filter(F.levenshtein(F.col("a.nm"), F.col("b.nm")) <= max_dist)
        .select(
            F.col("a.code").alias("code"),
            F.least(F.col("a.rep_id"), F.col("b.rep_id")).cast("long").alias("rep_a"),
            F.greatest(F.col("a.rep_id"), F.col("b.rep_id"))
            .cast("long")
            .alias("rep_b"),
            F.levenshtein(F.col("a.nm"), F.col("b.nm")).cast("long").alias("dist"),
        )
    )


def phonetic_links_oracle(
    source: str = DIRTY_REGISTRY_SQL, max_dist: int = 2
) -> str:
    """DuckDB twin of :func:`phonetic_links` — the same Soundex template
    instantiated for DuckDB's regexp_replace('g') dialect."""
    code = _soundex_expr("nm", "duckdb")
    return f"""
        WITH g AS MATERIALIZED (
          SELECT nm, MIN(id) AS rep_id, {code} AS code
          FROM (SELECT id, {_DUCK_NORM_NAME} AS nm FROM {source})
          WHERE nm <> '' GROUP BY nm
        )
        SELECT a.code AS code,
               CAST(least(a.rep_id, b.rep_id) AS BIGINT) AS rep_a,
               CAST(greatest(a.rep_id, b.rep_id) AS BIGINT) AS rep_b,
               CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
        FROM g a JOIN g b
          ON a.code = b.code AND a.nm < b.nm
         AND abs(len(a.nm) - len(b.nm)) <= {max_dist}
        WHERE levenshtein(a.nm, b.nm) <= {max_dist}
    """


def blocking_eval(
    records: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    max_dist: int = 2,
) -> DataFrame:
    """Blocking-strategy recall audit — the MDM engineering question
    "which true matches does each cheap blocker miss": ground truth is
    the complete levenshtein <= ``max_dist`` pair set over distinct
    normalized names (SymSpell delete-neighborhood — EXACT recall for
    the edit metric by construction), compared against

    - ``soundex``: equal-phonetic-code blocking + the same verify
      (misses typos that change the first letter or the consonant
      skeleton);
    - ``symspell_d1``: the one-edit neighborhood (misses all true
      2-edit pairs) — the cost/recall tradeoff made visible.

    Both candidate sets verify the same predicate, so precision is 1 by
    construction and the audit is pure RECALL: ``(strategy, n_true,
    n_found, n_missed, recall_ppm)`` with the exact-ppm trunc division.

    Scale: reuses the production blockers' own relations — nothing here
    is all-pairs on the record count (the brute force lives only in the
    DuckDB oracle, documented audit-sized).

    Physical shape (r15): ONE scored pair relation + ONE aggregation.
    Both arms are pure functions of the truth set, by the operator's own
    recall theorems: SymSpell at depth d has perfect recall for
    levenshtein <= d over the same name set, so the d1 arm == truth pairs
    with dist <= 1; and the phonetic candidates are lev-verified at the
    same ``max_dist`` (with a length band implied by the edit distance),
    so the soundex arm == truth pairs with equal codes. The previous form
    re-ran the d1 delete-expansion join and the whole phonetic block join
    (including a second normalization aggregate) only to semi-join both
    back against truth — three pair joins and two checkpoints where one
    suffices. This is the exact shape of the DuckDB oracle.
    """
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    g = (
        records.select(
            F.col(id_col).alias("__id"), _normalized(name_col).alias("nm")
        )
        .filter(F.col("nm") != "")
        .groupBy("nm")
        .agg(F.min("__id").alias("rep_id"))
        .withColumn("code", F.expr(_soundex_expr("nm", "spark")))
        .localCheckpoint()  # both sides of the delete-expansion join
    )
    var = g.select("nm", "code", F.col("nm").alias("__v"))
    for _ in range(max_dist):
        var = _expand_deletes(var, "__v")
    var = var.distinct()
    pairs = (
        var.select(F.col("nm").alias("na"), F.col("code").alias("ca"), "__v")
        .join(
            var.select(F.col("nm").alias("nb"), F.col("code").alias("cb"), "__v"),
            "__v",
        )
        .filter(F.col("na") < F.col("nb"))
        .select("na", "nb", "ca", "cb")
        .distinct()
        .withColumn("dist", F.levenshtein("na", "nb"))
        .filter(F.col("dist") <= max_dist)
    )
    stats = pairs.agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum(F.when(F.col("dist") <= 1, 1).otherwise(0)).alias("n_d1"),
        F.sum(F.when(F.col("ca") == F.col("cb"), 1).otherwise(0)).alias(
            "n_soundex"
        ),
    ).first()
    n_true = int(stats["n_true"])
    rows = [
        (
            name,
            n_true,
            found,
            n_true - found,
            (found * 1_000_000) // max(n_true, 1),  # non-neg: // == SQL div
        )
        for name, found in (
            ("soundex", int(stats["n_soundex"] or 0)),
            ("symspell_d1", int(stats["n_d1"] or 0)),
        )
    ]
    from flink_example_spark.operators.util import local_df

    return local_df(
        records.sparkSession,
        rows,
        "strategy string, n_true bigint, n_found bigint,"
        " n_missed bigint, recall_ppm bigint",
    )


def blocking_eval_oracle(
    source: str = DIRTY_REGISTRY_SQL, max_dist: int = 2
) -> str:
    """Brute-force DuckDB twin of :func:`blocking_eval`."""
    code = _soundex_expr("nm", "duckdb")
    return f"""
        WITH g AS MATERIALIZED (
          SELECT nm, MIN(id) AS rep_id, {code} AS code
          FROM (SELECT id, {_DUCK_NORM_NAME} AS nm FROM {source})
          WHERE nm <> '' GROUP BY nm
        ),
        truth AS MATERIALIZED (
          SELECT least(a.rep_id, b.rep_id) AS doc_a,
                 greatest(a.rep_id, b.rep_id) AS doc_b,
                 levenshtein(a.nm, b.nm) AS dist,
                 CAST(a.code = b.code AS INTEGER) AS same_code
          FROM g a JOIN g b ON a.nm < b.nm
          WHERE levenshtein(a.nm, b.nm) <= {max_dist}
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM truth)
        SELECT 'soundex' AS strategy, n_true,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM truth WHERE same_code = 1)
                 AS n_found,
               n_true - (SELECT CAST(COUNT(*) AS BIGINT) FROM truth
                         WHERE same_code = 1) AS n_missed,
               ((SELECT CAST(COUNT(*) AS BIGINT) FROM truth
                 WHERE same_code = 1) * 1000000)
                 // greatest(n_true, 1) AS recall_ppm
        FROM tot
        UNION ALL
        SELECT 'symspell_d1', n_true,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM truth WHERE dist <= 1),
               n_true - (SELECT CAST(COUNT(*) AS BIGINT) FROM truth
                         WHERE dist <= 1),
               ((SELECT CAST(COUNT(*) AS BIGINT) FROM truth WHERE dist <= 1)
                 * 1000000) // greatest(n_true, 1)
        FROM tot
    """
