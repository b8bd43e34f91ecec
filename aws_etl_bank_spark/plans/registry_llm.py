"""Registry part 2: LLM-data-pipeline operators (dedup, similarity, text,
multimodal) and streaming — each a first-class `queries()` entry.  Oracles
are provided where DuckDB can express the same computation; hash-family
ops (MinHash/SimHash/fingerprints) are rows-only by design.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from aws_etl_bank_spark.plans.registry import q
from aws_etl_bank_spark.sources.testdata import events_stream, load_table

_EN = "('the','a','of','and','to','in','is','it','that','for')"


@q("dedup_exact", """
SELECT text, MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS dup_count
FROM documents GROUP BY text""")
def dedup_exact(spark, sf_dir):
    from aws_etl_bank_spark.llm import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, ["text"], "doc_id")


@q("dedup_minhash_pairs")  # hash-family op: rows-only check
def dedup_minhash_pairs(spark, sf_dir):
    from aws_etl_bank_spark.llm import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "text", "doc_id", num_perm=64, bands=16,
                             jaccard_threshold=0.5)


@q("dedup_minhash_keep")  # rows-only
def dedup_minhash_keep(spark, sf_dir):
    from aws_etl_bank_spark.llm import minhash_dedup_keep

    docs = load_table(spark, sf_dir, "documents")
    return minhash_dedup_keep(docs, "text", "doc_id", num_perm=64, bands=16,
                              jaccard_threshold=0.5)


@q("graph_connected_components", """
WITH src AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 10 IN (0, 1, 2)),
nodes AS (SELECT k AS id FROM src UNION SELECT k + 1 FROM src)
SELECT CAST(id AS BIGINT) AS id,
       CAST((id // 10) * 10 AS BIGINT) AS component
FROM nodes""")
def graph_connected_components(spark, sf_dir):
    """Iterative connected components over an edge list — the transitive
    closure primitive behind chain-complete dedup.  Edges (k, k+1) for
    every customer key with k%10 in {0,1,2} build 4-node chains
    10n–10n+1–10n+2–10n+3, so the min label needs three propagation hops
    to reach the chain tail: a genuine multi-round fixpoint, checked
    against a closed-form oracle."""
    from aws_etl_bank_spark.llm import connected_components

    src = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").cast("long").alias("k"))
        .filter(F.col("k") % 10 <= 2)
    )
    pairs = src.select(F.col("k").alias("id_a"), (F.col("k") + 1).alias("id_b"))
    return connected_components(pairs)


@q("dedup_ngram_keep_transitive", r"""
WITH RECURSIVE w AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS words FROM documents
),
s AS (
  SELECT doc_id, unnest(
    CASE WHEN len(words) >= 3 THEN
      list_distinct([array_to_string(words[CAST(i AS INT):CAST(i + 2 AS INT)], ' ')
                     for i in range(1, len(words) - 1)])
    ELSE [array_to_string(words, ' ')] END) AS sh
  FROM w
),
sizes AS (SELECT doc_id, count(*) AS sz FROM s GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dup_pairs AS (
  SELECT id_a, id_b FROM common
  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE round(n_common / CAST(sa.sz + sb.sz - n_common AS DOUBLE), 4) >= 0.5
),
edges AS (SELECT id_a AS s, id_b AS d FROM dup_pairs
          UNION SELECT id_b, id_a FROM dup_pairs),
reach(id, r) AS (
  SELECT s, s FROM edges
  UNION
  SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s
),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT id FROM comp WHERE component < id)""")
def dedup_ngram_keep_transitive(spark, sf_dir):
    """Transitive-closure dedup keep over EXACT n-gram Jaccard pairs:
    exactly one survivor (the smallest doc_id) per duplicate chain, even
    when the chain never produced a direct pair between its endpoints.
    Oracle: recursive-CTE reachability in DuckDB."""
    from aws_etl_bank_spark.llm import dedup_keep_transitive, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=3, threshold=0.5)
    return dedup_keep_transitive(docs, pairs, "doc_id").select("doc_id")


@q("dedup_simhash_pairs")  # rows-only
def dedup_simhash_pairs(spark, sf_dir):
    from aws_etl_bank_spark.llm import simhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    return simhash_lsh_pairs(docs, "text", "doc_id", max_hamming=8)


@q("dedup_ngram_jaccard", r"""
WITH w AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS words FROM documents
),
s AS (
  SELECT doc_id, unnest(
    CASE WHEN len(words) >= 3 THEN
      list_distinct([array_to_string(words[CAST(i AS INT):CAST(i + 2 AS INT)], ' ')
                     for i in range(1, len(words) - 1)])
    ELSE [array_to_string(words, ' ')] END) AS sh
  FROM w
),
sizes AS (SELECT doc_id, count(*) AS sz FROM s GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_common
  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(n_common / CAST(sa.sz + sb.sz - n_common AS DOUBLE), 4) AS jaccard
FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE round(n_common / CAST(sa.sz + sb.sz - n_common AS DOUBLE), 4) >= 0.5""")
def dedup_ngram_jaccard(spark, sf_dir):
    """EXACT n-gram Jaccard join (inverted index, no LSH) — fully
    oracle-checkable, unlike the hash-family dedups."""
    from aws_etl_bank_spark.llm import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=3, threshold=0.5)


@q("dedup_embedding_pairs", """
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
              WHERE vec_id < 100000000),
all_v AS (SELECT vec_id, v FROM base
          UNION ALL SELECT vec_id + 1000000 AS vec_id, v FROM base),
pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 round(list_cosine_similarity(a.v, b.v), 4) AS cosine
          FROM all_v a JOIN all_v b ON a.vec_id < b.vec_id)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.95""")
def dedup_embedding_pairs(spark, sf_dir):
    """The sf embeddings have no organic near-dups (max off-diagonal cosine
    ≈ 0.51), so the operator is exercised on a planted-duplicate set: the
    table unioned with an id-shifted copy of itself.  Because every other
    pair is far below the 0.95 threshold, hyperplane-LSH recall is exactly
    1.0 here and the output is oracle-checkable against an all-pairs
    DuckDB cosine scan.  Pinned to copy 0 (vec_id < 100M) like
    _planted_embeddings: the make_sf.py upscale plants ~0.997-cosine
    cross-copy near-dups whose LSH recall is not guaranteed."""
    from aws_etl_bank_spark.llm import embedding_dup_pairs

    emb = (load_table(spark, sf_dir, "embeddings")
           .filter(F.col("vec_id") < 100_000_000)
           .select("vec_id", "embedding"))
    planted = emb.unionAll(
        emb.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    )
    return embedding_dup_pairs(planted, "embedding", "vec_id", dim=64,
                               n_planes=8, cosine_threshold=0.95)


def _planted_embeddings(spark, sf_dir):
    """embeddings ∪ an id-shifted exact copy — same fixture as
    dedup_embedding_pairs; the only pairs at cosine ≥ 0.95 are the
    planted twins (organic max ≈ 0.51), so cell-bounded comparison has
    provable recall 1.0 here (identical vectors co-cell always).

    Pinned to copy 0 (``vec_id < 100M``): make_sf.py upscales by
    stacking PERTURBED copies (+i*0.001 per component) whose cross-copy
    cosines reach ~0.997 — genuine near-dups that can legitimately land
    in different cells, breaking the twins-only contract at sf1+.  Copy
    0 is byte-identical to the source table at every factor, so the
    filter keeps the oracle scale-invariant (and is a no-op at the
    driver's sf0.01)."""
    emb = (load_table(spark, sf_dir, "embeddings")
           .filter(F.col("vec_id") < 100_000_000)
           .select("vec_id", "embedding"))
    return emb.unionAll(
        emb.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    )


@q("dedup_semantic_pairs", """
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
              WHERE vec_id < 100000000),
all_v AS (SELECT vec_id, v FROM base
          UNION ALL SELECT vec_id + 1000000 AS vec_id, v FROM base),
pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 round(list_cosine_similarity(a.v, b.v), 4) AS cosine
          FROM all_v a JOIN all_v b ON a.vec_id < b.vec_id)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.95""")
def dedup_semantic_pairs(spark, sf_dir):
    """SemDeDup-style semantic dedup (llm/dedup.py semantic_dedup_pairs):
    nearest-centroid cells, cosine compared only within a cell.  On the
    planted fixture the output must equal DuckDB's all-pairs cosine scan
    at the same threshold — a missing twin means cell assignment split
    identical vectors (impossible by the deterministic tie-break), an
    extra pair means the threshold leaked."""
    from aws_etl_bank_spark.llm import semantic_dedup_pairs

    return semantic_dedup_pairs(_planted_embeddings(spark, sf_dir),
                                "embedding", "vec_id", n_cells=64,
                                cosine_threshold=0.95)


@q("dedup_semantic_keep", """
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
              WHERE vec_id < 100000000),
all_v AS (SELECT vec_id, v FROM base
          UNION ALL SELECT vec_id + 1000000 AS vec_id, v FROM base),
losers AS (SELECT DISTINCT b.vec_id
           FROM all_v a JOIN all_v b ON a.vec_id < b.vec_id
           WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.95)
SELECT vec_id FROM all_v WHERE vec_id NOT IN (SELECT vec_id FROM losers)""")
def dedup_semantic_keep(spark, sf_dir):
    """Keep path of semantic dedup: one survivor (smallest id) per
    connected component.  On the planted fixture components are disjoint
    twin pairs, so the survivor set is exactly all ids minus each pair's
    larger id — DuckDB-expressible."""
    from aws_etl_bank_spark.llm import semantic_dedup_keep

    return semantic_dedup_keep(_planted_embeddings(spark, sf_dir),
                               "embedding", "vec_id", n_cells=64,
                               cosine_threshold=0.95).select("vec_id")


@q("ann_bruteforce_topk", """
WITH qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id < 5),
cv AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (SELECT qv.query_id, cv.neighbor_id,
             round(list_cosine_similarity(qv.v, cv.v), 6) AS sim
      FROM qv, cv WHERE cv.neighbor_id != qv.query_id)
SELECT query_id, neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
FROM s QUALIFY rank <= 10""")
def ann_bruteforce_topk(spark, sf_dir):
    from aws_etl_bank_spark.llm import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = brute_force_topk(emb, emb.filter("vec_id < 5"), 10)
    return out.select("query_id", "neighbor_id", "rank")


#: the shared top-k depth — interpolated into BOTH the oracle literal
#: and the helper's call sites so they cannot drift (a reused oracle
#: with a different k would otherwise fail as a bare count mismatch)
_ANN_K = 10

#: shared oracle text for the approximate-top-k shape contracts: 5
#: query vectors (vec_id < 5), k rows each, every neighbor a real
#: corpus id, ranks exactly 1..k, neighbors distinct, scores in range
_ANN_TOPK_INVARIANT_ORACLE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(COUNT(*) * {_ANN_K} AS BIGINT) AS n_rows,
       CAST(COUNT(*) * {_ANN_K} AS BIGINT) AS n_contained,
       true AS k_rows_each,
       true AS ranks_complete,
       true AS neighbors_distinct,
       true AS scores_in_range
FROM embeddings WHERE vec_id < 5"""


def _ann_topk_invariants(result, corpus_ids, k, score_col, score_pred):
    """Invariant oracle for approximate top-k results (r15, extending
    the sample_limit precedent to the ANN family): WHICH neighbors an
    IVF/PQ index returns is not SQL-reproducible (that's what the
    planted-twin companions pin), but the result SHAPE is a hard
    contract — exactly k rows per query with ranks EXACTLY 1..k (k
    distinct ranks with min 1 and max k — a sum check alone would
    accept compensating duplicates), every neighbor a genuine corpus
    id, no neighbor repeated within a query, and every score NON-NULL
    and inside its metric's valid range (``bool_and`` alone skips
    NULLs, so the non-null conjunct is explicit).  All checks are
    computed FROM the result in ONE aggregation pass (containment via
    a left-join marker, not a separate semi-join branch), so a bug
    that drops, duplicates, or fabricates candidates reads out as a
    false flag without re-executing the ranking plan per branch."""
    marked = result.join(
        corpus_ids.withColumnRenamed("vec_id", "neighbor_id")
        .withColumn("__in_corpus", F.lit(1)),
        "neighbor_id", "left")
    per_q = marked.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("rank").alias("n_ranks"),
        F.min("rank").alias("rmin"),
        F.max("rank").alias("rmax"),
        F.count_distinct("neighbor_id").alias("nd"),
        F.count_if(F.col("__in_corpus").isNotNull()).alias("n_in"),
        F.bool_and(score_pred & F.col(score_col).isNotNull())
        .alias("score_ok"))
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.sum("n_in").cast("bigint").alias("n_contained"),
        F.bool_and(F.col("n") == k).alias("k_rows_each"),
        F.bool_and((F.col("n_ranks") == k) & (F.col("rmin") == 1)
                   & (F.col("rmax") == k)).alias("ranks_complete"),
        F.bool_and(F.col("nd") == k).alias("neighbors_distinct"),
        F.bool_and(F.col("score_ok")).alias("scores_in_range")
    ).select("n_queries", "n_rows", "n_contained", "k_rows_each",
             "ranks_complete", "neighbors_distinct", "scores_in_range")


@q("ann_ivf_topk", _ANN_TOPK_INVARIANT_ORACLE)
def ann_ivf_topk(spark, sf_dir):
    """IVF top-10 over the full embeddings table, converted from
    rows-only to the shape-contract invariant oracle (see
    ``_ann_topk_invariants``); neighbor-level recall is pinned by the
    planted-twin companion ann_ivf_planted_twin."""
    from aws_etl_bank_spark.llm import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_topk(emb, emb.filter("vec_id < 5"), _ANN_K,
                   n_cells=16, nprobe=4)
    return _ann_topk_invariants(
        out, emb.select("vec_id"), _ANN_K, "cosine",
        F.col("cosine").between(-1.0, 1.0))


#: the quality-score model as DuckDB CTEs — shared by the stats entry
#: and the top-fraction selection oracle
_QUALITY_CTES = f"""w AS (
    SELECT doc_id, text,
           string_split_regex(lower(text), '\\s+') AS words,
           length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_punct
    FROM documents
),
s AS (
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_computed,
           CAST(len(words) AS BIGINT) AS n_tokens,
           round(length(text) / CAST(len(words) AS DOUBLE), 4) AS avg_token_len,
           round(n_punct / CAST(length(text) AS DOUBLE), 4) AS punct_ratio,
           round(len(list_filter(words, x -> x IN {_EN})) / CAST(len(words) AS DOUBLE), 4)
               AS stopword_ratio
    FROM w
),
q AS (
SELECT doc_id, n_chars_computed, n_tokens, avg_token_len, punct_ratio, stopword_ratio,
       round((least(n_tokens / 100.0, 1.0) * 0.5 + least(stopword_ratio * 5.0, 1.0) * 0.3)
             * greatest(0.0, 1.0 - punct_ratio * 5.0)
             + 0.2 * greatest(0.0, 1.0 - punct_ratio * 5.0) + 0.000000001, 4) AS quality
FROM s
)"""


@q("text_stats_quality", f"""
WITH {_QUALITY_CTES}
SELECT doc_id, n_chars_computed, n_tokens, avg_token_len, punct_ratio, stopword_ratio,
       quality
FROM q""")
def text_stats_quality(spark, sf_dir):
    from aws_etl_bank_spark.llm import quality_score

    docs = load_table(spark, sf_dir, "documents")
    return quality_score(docs).select(
        "doc_id", "n_chars_computed", "n_tokens", "avg_token_len",
        "punct_ratio", "stopword_ratio", "quality",
    )


@q("text_quality_top_fraction", f"""
WITH {_QUALITY_CTES}
SELECT doc_id, quality FROM q
WHERE quality IS NOT NULL
QUALIFY row_number() OVER (ORDER BY quality DESC, doc_id)
        <= CAST(floor(0.2 * (COUNT(*) OVER ())) AS BIGINT)""")
def text_quality_top_fraction(spark, sf_dir):
    """Exact top-20%-by-quality corpus selection via the distributed
    histogram-selection operator (functions/scale.py top_fraction): rows
    in strictly-better histogram buckets are selected wholesale and only
    the boundary bucket (~n/n_buckets rows) is exactly ranked — no
    global sort, no corpus-wide window, unlike the oracle's
    row_number() OVER () form which is the single-task shape this
    operator exists to avoid.  Exactly floor(0.2·n) rows."""
    from aws_etl_bank_spark.functions.scale import top_fraction
    from aws_etl_bank_spark.llm import quality_score

    docs = load_table(spark, sf_dir, "documents")
    scored = quality_score(docs).select("doc_id", "quality")
    return top_fraction(scored, "quality", 0.2, "doc_id")


@q("text_quality_top_fraction_by_lang", f"""
WITH {_QUALITY_CTES},
ql AS (SELECT q.doc_id, d.lang, q.quality
       FROM q JOIN documents d ON d.doc_id = q.doc_id
       WHERE q.quality IS NOT NULL)
SELECT doc_id, lang, quality FROM ql
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id)
        <= CAST(floor(0.3 * (COUNT(*) OVER (PARTITION BY lang))) AS BIGINT)""")
def text_quality_top_fraction_by_lang(spark, sf_dir):
    """Stratified curation: the best 30% of documents PER LANGUAGE
    (functions/scale.py top_fraction_by_group) — a grouped window is
    the scale-correct shape here (parallelism = #groups), unlike the
    global selection where a window collapses to one task."""
    from aws_etl_bank_spark.functions.scale import top_fraction_by_group
    from aws_etl_bank_spark.llm import quality_score

    docs = load_table(spark, sf_dir, "documents")
    scored = quality_score(docs).select("doc_id", "lang", "quality")
    return top_fraction_by_group(scored, ["lang"], "quality", 0.3, "doc_id")


@q("scale_shuffle_key", """
SELECT doc_id,
       ((((doc_id + 7919) % 1000003 + 1000003) % 1000003) * 427799)
           % 1000003 AS skey
FROM documents""")
def scale_shuffle_key(spark, sf_dir):
    """Deterministic epoch-shuffle key (functions/scale.py shuffle_key):
    order by (skey, id) for a reproducible pseudo-random training order;
    epoch=1 shifts the permutation.  Engine-reproducible bounded Knuth
    arithmetic (the hash_split/dsir family), map-only, zero shuffles —
    the ordering itself is a range-partitioned sort when materialized,
    never a rank-assignment window."""
    from aws_etl_bank_spark.functions.scale import shuffle_key

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", shuffle_key("doc_id", epoch=1).alias("skey"))


@q("text_token_counts", """
SELECT doc_id,
       CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tokens,
       CAST(greatest(len(string_split_regex(text, '[\\s[:punct:]]+')),
                     CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS bpe_ish_tokens
FROM documents""")
def text_token_counts(spark, sf_dir):
    from aws_etl_bank_spark.llm.text import bpe_ish_token_count, token_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).alias("bpe_ish_tokens"),
    )


def _langid_oracle() -> str:
    """DuckDB mirror of ``language_id``: same profiles, same scoring, same
    argmax tie-break (struct comparison orders by score then lang)."""
    from aws_etl_bank_spark.llm.text import STOPWORD_PROFILES

    entries = []
    for lang, profile in sorted(STOPWORD_PROFILES.items()):
        in_list = ", ".join(f"'{w}'" for w in profile)
        entries.append(
            "{'score': round(len(list_filter(words, x -> x IN (" + in_list
            + "))) / CAST(len(words) AS DOUBLE), 6), 'lang': '" + lang + "'}"
        )
    structs = ",\n      ".join(entries)
    return rf"""
WITH w AS (
  SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS words
  FROM documents
),
s AS (
  SELECT doc_id, lang,
    list_max([
      {structs}
    ]) AS best
  FROM w
)
SELECT doc_id, lang, best.lang AS predicted_lang,
       round(best.score, 4) AS lang_score
FROM s"""


@q("text_langid", _langid_oracle())
def text_langid(spark, sf_dir):
    from aws_etl_bank_spark.llm import language_id

    docs = load_table(spark, sf_dir, "documents")
    return language_id(docs).select("doc_id", "lang", "predicted_lang", "lang_score")


@q("text_fingerprint", """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       true AS fp_functional,
       true AS fp_discriminates,
       true AS fp_nonnull
FROM documents""")
def text_fingerprint(spark, sf_dir):
    """Document fingerprinting (whole-text xxhash64 + winnowing-style
    min n-gram hash), converted from rows-only to an INVARIANT oracle
    (r15, the sample_limit precedent): the hash VALUES are not
    SQL-reproducible, but their contract is — (a) one fingerprint row
    per document, (b) FUNCTIONAL over normalized text (identical
    normalized content ⇒ identical fingerprint pair; the property that
    makes fingerprints usable as dedup keys), (c) DISCRIMINATING on
    this corpus (distinct text classes ⇒ distinct fingerprint pairs —
    a 64-bit birthday collision at sf1's 1.5M docs has probability
    ~1e-7, accepted), and (d) non-null everywhere.  The normalization
    here mirrors llm.text.fingerprint's exactly (lower + whitespace
    collapse), so (b)/(c) test the real implementation, not a
    tautology."""
    from aws_etl_bank_spark.llm import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    fp = fingerprint(docs)
    # coalesce to a sentinel so a NULL-text doc counts as ONE class on
    # BOTH sides of the functional/discriminating compare (count_distinct
    # drops NULL norms but keeps the never-null fingerprint struct —
    # asymmetric without this; latent, current generators emit no NULLs)
    norm = F.coalesce(
        F.regexp_replace(F.lower(F.col("text")), r"\s+", " "),
        F.lit("\x00__null_text__"))
    joined = (docs.select("doc_id", norm.alias("__norm"))
              .join(fp, "doc_id"))
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count_distinct("__norm")
         == F.count_distinct("__norm", "content_hash", "min_gram_hash"))
        .alias("fp_functional"),
        (F.count_distinct("__norm")
         == F.count_distinct(F.struct("content_hash", "min_gram_hash")))
        .alias("fp_discriminates"),
        (F.count_if(F.col("content_hash").isNull()
                    | F.col("min_gram_hash").isNull()) == 0)
        .alias("fp_nonnull"))


def _planted_corpus(spark, sf_dir):
    """documents ∪ exact copies of every 20th doc (new ids +1_000_000):
    a deterministic fixture both Spark and DuckDB rebuild identically,
    giving the hash-family ops a provable ground truth — identical texts
    MUST collide in every hash scheme, so the exact-duplicate projection
    of their candidate sets is oracle-checkable even though the full
    near-dup sets are not SQL-expressible."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = (docs.filter(F.col("doc_id") % 20 == 0)
              .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000)))
    return docs.unionByName(copies)


_PLANTED_PAIRS_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 20 = 0
),
cls AS (SELECT text, MIN(doc_id) AS rep FROM corpus GROUP BY text)
SELECT c.rep AS id_a, a.doc_id AS id_b
FROM corpus a JOIN cls c ON a.text = c.text AND a.doc_id > c.rep"""


def _exact_text_pairs(corpus, pairs):
    """Restrict candidate pairs to identical-text pairs — the provable
    subset (full-recall guarantee: identical text ⇒ same exact-dup
    class ⇒ a star edge from the class representative).  Since the r6
    exact-duplicate pre-pass, the identical-text subset is the STAR set
    (rep, member) per class, not the clique — the oracle mirrors that
    (equal for the twin classes the planted fixture creates; linear, not
    quadratic, on bigger classes)."""
    a = corpus.select(F.col("doc_id").alias("id_a"), F.col("text").alias("__ta"))
    b = corpus.select(F.col("doc_id").alias("id_b"), F.col("text").alias("__tb"))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .filter(F.col("__ta") == F.col("__tb"))
        .select("id_a", "id_b")
    )


@q("dedup_minhash_planted_pairs", _PLANTED_PAIRS_ORACLE)
def dedup_minhash_planted_pairs(spark, sf_dir):
    """Oracle-checked projection of banded MinHash-LSH (llm/dedup.py):
    on the planted corpus, the identical-text subset of the LSH candidate
    pairs must be EXACTLY the text-equality self-join DuckDB computes —
    a missing row means the banding lost an exact duplicate (recall
    bug), an extra row is impossible by construction.  The general
    near-dup set stays rows-only (dedup_minhash_pairs)."""
    from aws_etl_bank_spark.llm import minhash_lsh_pairs

    corpus = _planted_corpus(spark, sf_dir)
    pairs = minhash_lsh_pairs(corpus, "text", "doc_id", num_perm=64,
                              bands=16, jaccard_threshold=0.5)
    return _exact_text_pairs(corpus, pairs)


@q("dedup_simhash_planted_pairs", _PLANTED_PAIRS_ORACLE)
def dedup_simhash_planted_pairs(spark, sf_dir):
    """Oracle-checked projection of chunked SimHash (llm/dedup.py), same
    planted-corpus contract as dedup_minhash_planted_pairs: identical
    text ⇒ hamming 0 ⇒ every 16-bit chunk collides ⇒ pair found."""
    from aws_etl_bank_spark.llm import simhash_lsh_pairs

    corpus = _planted_corpus(spark, sf_dir)
    pairs = simhash_lsh_pairs(corpus, "text", "doc_id")
    return _exact_text_pairs(corpus, pairs)


@q("text_fingerprint_planted", """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 20 = 0
)
SELECT MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS dup_count
FROM corpus GROUP BY text HAVING COUNT(*) > 1""")
def text_fingerprint_planted(spark, sf_dir):
    """Oracle-checked projection of document fingerprinting (llm/text.py):
    grouping the planted corpus by (content_hash, min_gram_hash) and
    keeping groups >1 must reproduce DuckDB's group-by-text — identical
    text hashes identically (pure function), and distinct texts
    colliding on a 64-bit xxhash at this corpus size would be a real
    fingerprint defect."""
    from aws_etl_bank_spark.llm import fingerprint

    corpus = _planted_corpus(spark, sf_dir)
    return (
        fingerprint(corpus)
        .groupBy("content_hash", "min_gram_hash")
        .agg(F.min("doc_id").alias("keep_id"),
             F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
        .select("keep_id", "dup_count")
    )


def _twin_token_corpus(spark, sf_dir):
    """Controlled dedup fixture over the documents ids: every doc's text
    is 12 tokens derived from its own doc_id (``w<id>x<i>``), so two
    DISTINCT docs share no shingle (true jaccard 0) while each planted
    twin (every 20th id, copied to id+1_000_000 with the SAME text) has
    jaccard 1.  Because ``minhash_lsh_pairs`` exact-verifies candidates
    against the jaccard threshold, the final pair set is GUARANTEED to be
    exactly the twin pairs — which makes the whole keep composition
    (signature → bands → candidate join → connected components →
    anti-join) oracle-checkable, unlike the free-text corpus whose
    near-dup set is not SQL-expressible."""
    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .withColumn(
            "text",
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(0), F.lit(11)),
                lambda i: F.concat(F.lit("w"), F.col("doc_id").cast("string"),
                                   F.lit("x"), i.cast("string")))),
        )
    )
    twins = (base.filter(F.col("doc_id") % 20 == 0)
             .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000)))
    return base.unionByName(twins)


@q("dedup_minhash_planted_keep", """
SELECT doc_id FROM documents""")
def dedup_minhash_planted_keep(spark, sf_dir):
    """Oracle-checked keep path of MinHash-LSH dedup (VERDICT r4 items
    4b/7): on the twin-token corpus the verified pair set is exactly the
    planted twins, so transitive keep must equal the exact-dedup keep
    set — every original id survives (it is the min of its component),
    every planted copy is dropped.  The oracle is simply the original
    documents ids."""
    from aws_etl_bank_spark.llm import minhash_dedup_keep

    corpus = _twin_token_corpus(spark, sf_dir)
    keep = minhash_dedup_keep(corpus, "text", "doc_id", transitive=True,
                              num_perm=64, bands=16, jaccard_threshold=0.5)
    return keep.select("doc_id")


@q("multimodal_meta", """
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 256 AS INTEGER) AS width,
       CAST((octet_length(encode(text)) * 7) % 256 AS INTEGER) AS height
FROM documents""")
def multimodal_meta(spark, sf_dir):
    """Binary-payload plumbing: attach payload + decode features through the
    Arrow-batched stub decoder (mean_byte excluded from the oracle-checked
    projection; it is exercised in tests)."""
    from aws_etl_bank_spark.llm import attach_binary_payload, decode_image_features

    docs = load_table(spark, sf_dir, "documents")
    feats = decode_image_features(attach_binary_payload(docs), fake=True)
    return feats.select("doc_id", "n_bytes", "width", "height")


@q("multimodal_frames", """
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS total FROM documents),
s AS (SELECT doc_id, total,
             greatest(CAST(floor(total / 4.0) AS INT), 1) AS step FROM b),
f AS (SELECT doc_id, unnest(range(0, 4)) AS frame_index, total, step FROM s)
SELECT doc_id, CAST(frame_index AS INT) AS frame_index,
       CAST(greatest(least(step, total - frame_index * step), 0) AS BIGINT)
           AS frame_n_bytes
FROM f""")
def multimodal_frames(spark, sf_dir):
    from aws_etl_bank_spark.llm import attach_binary_payload, sample_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_binary_payload(docs), n_frames=4)


_PPM_IMGS_SQL = """
imgs AS (SELECT doc_id AS d, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
         FROM documents WHERE doc_id < 500)"""


@q("multimodal_decode_ppm", f"""
WITH {_PPM_IMGS_SQL},
px AS (SELECT d, w, h, unnest(range(0, w * h * 3)) AS i FROM imgs)
SELECT d AS doc_id,
       CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
            + 3 * w * h AS BIGINT) AS n_bytes,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       ROUND(avg((d * 31 + i * 7) % 256), 4) AS mean_byte
FROM px GROUP BY d, w, h""")
def multimodal_decode_ppm(spark, sf_dir):
    """REAL image decoding (llm/multimodal.py decode_image_features,
    fake=False): deterministic P6 PPM payloads are generated per doc id
    (synthetic_ppm_payloads — pixel i of image d is (d·31 + i·7) mod
    256), then decoded by the numpy P6 parser inside Arrow-batched
    mapInPandas.  Because the fixture is closed-form, the oracle
    recomputes width/height from the id arithmetic, n_bytes from the
    exact header length, and mean_byte by averaging the SAME pixel
    formula over unnest(range(w·h·3)) — a wrong header parse, offset,
    or dropped pixel byte shifts the mean and fails the hash.  The
    decoder itself (not the fixture) is what's under test; BMP and the
    corrupt-payload NULL policy are pinned in tests/test_llm.py."""
    from aws_etl_bank_spark.llm.multimodal import (decode_image_features,
                                                   synthetic_ppm_payloads)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    imgs = synthetic_ppm_payloads(docs)
    return decode_image_features(imgs, fake=False)


@q("multimodal_thumbnail_vec", f"""
WITH {_PPM_IMGS_SQL},
pos AS (SELECT d, w, h, unnest(range(0, 16)) AS p FROM imgs),
g AS (SELECT d, w, h, p,
             (((p // 4) * h) // 4 * w + (p % 4) * w // 4) * 3
                 AS base
      FROM pos),
v AS (SELECT d, p,
             (CAST((d * 31 + base * 7) % 256 AS DOUBLE)
              + (d * 31 + (base + 1) * 7) % 256
              + (d * 31 + (base + 2) * 7) % 256) / 3.0 / 255.0 AS val
      FROM g)
SELECT d AS doc_id, CAST(16 AS INT) AS dim,
       ROUND(avg(CAST(CAST(val AS FLOAT) AS DOUBLE)), 4) AS mean_val
FROM v GROUP BY d""")
def multimodal_thumbnail_vec(spark, sf_dir):
    """Decode → nearest-neighbor resize (4×4) → grayscale → unit-range
    vector (llm/multimodal.py image_grayscale_vector): the
    image-to-embedding step that feeds the ANN / semantic-dedup
    operators.  The oracle replays the whole gather in SQL — thumbnail
    position p maps to source pixel ((⌊p/4⌋·h)//4, (p%4·w)//4), channel
    mean over the closed-form pixel bytes, float32 quantization
    matched by the FLOAT cast — and compares the per-image vector mean
    to 4 decimals plus the declared dimensionality; a wrong gather
    index, channel order, or normalization shifts the mean.  Map-only
    (Arrow mapInPandas), no shuffle; the full per-element vector
    equality is pinned in tests/test_llm.py."""
    from aws_etl_bank_spark.llm.multimodal import (image_grayscale_vector,
                                                   synthetic_ppm_payloads)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    vec = image_grayscale_vector(synthetic_ppm_payloads(docs),
                                 out_w=4, out_h=4)
    mean_val = F.aggregate("vector", F.lit(0.0),
                           lambda a, x: a + x.cast("double")) / F.size("vector")
    return vec.select("doc_id", F.size("vector").alias("dim"),
                      F.round(mean_val, 4).alias("mean_val"))


@q("multimodal_decode_jpeg", """
WITH imgs AS (
  SELECT doc_id AS d, 1 + doc_id % 3 AS bx, 1 + doc_id % 2 AS by
  FROM documents WHERE doc_id < 300),
blk AS (SELECT d, bx, by, unnest(range(0, bx * by)) AS b FROM imgs),
v AS (SELECT d, bx, by,
             2 * ((31 * d + 17 * b) % 128) AS vy,
             2 * ((7 * d + 29 * b) % 128) AS vcb,
             2 * ((13 * d + 23 * b) % 128) AS vcr
      FROM blk),
px AS (SELECT d, bx, by,
  LEAST(255, GREATEST(0, floor(vy + 1.402 * (vcr - 128) + 0.5))) AS r,
  LEAST(255, GREATEST(0, floor(vy - 0.344136 * (vcb - 128)
                               - 0.714136 * (vcr - 128) + 0.5))) AS g,
  LEAST(255, GREATEST(0, floor(vy + 1.772 * (vcb - 128) + 0.5))) AS bl
  FROM v)
SELECT d AS doc_id,
       CAST(8 * bx AS INT) AS width, CAST(8 * by AS INT) AS height,
       floor(avg(r) * 10000 + 0.5) / 10000 AS mean_r,
       floor(avg(g) * 10000 + 0.5) / 10000 AS mean_g,
       floor(avg(bl) * 10000 + 0.5) / 10000 AS mean_b
FROM px GROUP BY d, bx, by""")
def multimodal_decode_jpeg(spark, sf_dir):
    """REAL JPEG decoding with a from-scratch baseline-sequential codec
    (llm/jpeg.py — marker walk, DHT canonical Huffman build, entropy
    decode with byte-unstuffing, DC prediction, dequant, inverse
    zigzag, float IDCT, JFIF YCbCr→RGB), the r10-verdict follow-up to
    the avro-codec play: no image library exists in the runtime, so
    the decoder is implemented from the public T.81 spec and run
    Arrow-batched in mapInPandas (map-only, no shuffle).  The planted
    fixture (synthetic_jpeg_payloads) is block-constant with EVEN
    YCbCr values and DC quant step 16, which makes the whole decode
    chain integer-exact and closed-form in doc_id (llm/jpeg.py
    fixture_spec) — the oracle replays block geometry, the planted
    constants, and the exact float color transform in SQL, so a wrong
    Huffman code, DC-diff chain, dequant step, IDCT scale, or channel
    order shifts a mean and fails the hash.  Means are exact-integer
    sums / exact counts (order-free); the floor(x·10⁴+0.5)/10⁴ canon
    avoids engine round() half-tie skew.  General-path correctness
    (AC coefficients, 4:2:0, restart markers, corrupt-payload NULLs)
    is pinned in tests/test_jpeg.py."""
    from aws_etl_bank_spark.llm.jpeg import (decode_jpeg_features,
                                             synthetic_jpeg_payloads)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    feats = decode_jpeg_features(synthetic_jpeg_payloads(docs))

    def canon(c):
        return F.floor(F.col(c) * 10000 + F.lit(0.5)) / 10000

    return feats.select(
        "doc_id", "width", "height",
        canon("mean_r").alias("mean_r"),
        canon("mean_g").alias("mean_g"),
        canon("mean_b").alias("mean_b"))


@q("multimodal_decode_jpeg420", """
WITH imgs AS (
  SELECT doc_id AS d, 2 * (1 + doc_id % 2) AS bx, 2 AS by,
         2 * ((7 * doc_id) % 128) AS vcb,
         2 * ((13 * doc_id) % 128) AS vcr
  FROM documents WHERE doc_id < 200),
blk AS (SELECT d, bx, by, vcb, vcr, unnest(range(0, bx * by)) AS b
        FROM imgs),
v AS (SELECT d, bx, by, vcb, vcr,
             2 * ((31 * d + 17 * b) % 128) AS vy
      FROM blk),
px AS (SELECT d, bx, by,
  LEAST(255, GREATEST(0, floor(vy + 1.402 * (vcr - 128) + 0.5))) AS r,
  LEAST(255, GREATEST(0, floor(vy - 0.344136 * (vcb - 128)
                               - 0.714136 * (vcr - 128) + 0.5))) AS g,
  LEAST(255, GREATEST(0, floor(vy + 1.772 * (vcb - 128) + 0.5))) AS bl
  FROM v)
SELECT d AS doc_id,
       CAST(8 * bx AS INT) AS width, CAST(8 * by AS INT) AS height,
       floor(avg(r) * 10000 + 0.5) / 10000 AS mean_r,
       floor(avg(g) * 10000 + 0.5) / 10000 AS mean_g,
       floor(avg(bl) * 10000 + 0.5) / 10000 AS mean_b
FROM px GROUP BY d, bx, by""")
def multimodal_decode_jpeg420(spark, sf_dir):
    """The CHROMA-SUBSAMPLED decode path under the oracle gate:
    4:2:0 baseline JPEGs (full 16×16 MCUs, 2×2 Y blocks + 1 Cb + 1 Cr
    per MCU) with per-block Y and per-image chroma constants
    (llm/jpeg.py fixture_spec_420) — a constant chroma plane
    box-averages to itself, DC-roundtrips exactly, and
    nearest-upsamples back to the same constant, so MCU interleave
    order, sampling-factor bookkeeping, and the upsample gather are
    all hash-checked closed-form (a swapped Y-block within the MCU or
    a mis-strided upsample shifts a block mean).  Same canon as
    multimodal_decode_jpeg."""
    from aws_etl_bank_spark.llm.jpeg import (decode_jpeg_features,
                                             synthetic_jpeg_payloads)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    feats = decode_jpeg_features(
        synthetic_jpeg_payloads(docs, subsampling="4:2:0"))

    def canon(c):
        return F.floor(F.col(c) * 10000 + F.lit(0.5)) / 10000

    return feats.select(
        "doc_id", "width", "height",
        canon("mean_r").alias("mean_r"),
        canon("mean_g").alias("mean_g"),
        canon("mean_b").alias("mean_b"))


@q("multimodal_decode_png", """
WITH imgs AS (
  SELECT doc_id AS d, 4 + doc_id % 9 AS w, 3 + doc_id % 5 AS h
  FROM documents WHERE doc_id < 400),
px AS (SELECT d, w, h, unnest(range(0, w * h * 3)) AS i FROM imgs)
SELECT d AS doc_id,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(3 AS INT) AS n_channels,
       floor(avg((31 * d + 7 * i) % 256) * 10000 + 0.5) / 10000
           AS mean_byte
FROM px GROUP BY d, w, h""")
def multimodal_decode_png(spark, sf_dir):
    """REAL PNG decoding with a from-scratch codec (llm/png.py —
    chunk walk with CRC-32 verification, IDAT inflate via stdlib
    zlib, and full scanline unfiltering: None/Sub/Up/Average/Paeth
    including the floor-average and Paeth tie rules).  Fixture rows
    CYCLE all five filter types at encode time; PNG is lossless, so
    the planted closed-form pixels must come back exactly through
    every unfilter path — a wrong Paeth tie-break or average floor
    shifts the mean and fails the hash.  Same Arrow-batched
    map-only shape as the PPM/BMP/JPEG decoders."""
    from aws_etl_bank_spark.llm.png import (decode_png_features,
                                            synthetic_png_payloads)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    feats = decode_png_features(synthetic_png_payloads(docs))
    return feats.select(
        "doc_id", "width", "height", "n_channels",
        (F.floor(F.col("mean_byte") * 10000 + F.lit(0.5)) / 10000)
        .alias("mean_byte"))


@q("multimodal_decode_gif", """
WITH imgs AS (
  SELECT doc_id AS d, 4 + doc_id % 9 AS w, 3 + doc_id % 5 AS h
  FROM documents WHERE doc_id < 400),
px AS (SELECT d, w, h,
              (31 * d + 7 * unnest(range(0, w * h))) % 64 AS idx
       FROM imgs)
SELECT d AS doc_id,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       floor(avg((4 * idx) % 256) * 10000 + 0.5) / 10000 AS mean_r,
       floor(avg((3 * idx) % 256) * 10000 + 0.5) / 10000 AS mean_g,
       floor(avg((5 * idx) % 256) * 10000 + 0.5) / 10000 AS mean_b
FROM px GROUP BY d, w, h""")
def multimodal_decode_gif(spark, sf_dir):
    """REAL GIF decoding with from-scratch LZW (llm/gif.py): header /
    color-table / sub-block walk plus full LZW dictionary protocol —
    code-size escalation, the KwKwK special case, CLEAR resets at the
    4096 ceiling — implemented from the public spec (no image or LZW
    library here).  GIF is lossless on palette indices, so the
    planted closed-form fixture (index (31d+7i)%64 through the
    (4j,3j,5j)%256 palette) hash-checks the whole decompressor: a
    wrong width-bump boundary or KwKwK branch scrambles pixels and
    the channel means.  Fourth codec in the image family
    (PPM/BMP/JPEG/PNG/GIF); same Arrow-batched map-only shape."""
    from aws_etl_bank_spark.llm.gif import (decode_gif_features,
                                            synthetic_gif_payloads)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    feats = decode_gif_features(synthetic_gif_payloads(docs))

    def canon(c):
        return F.floor(F.col(c) * 10000 + F.lit(0.5)) / 10000

    return feats.select(
        "doc_id", "width", "height",
        canon("mean_r").alias("mean_r"),
        canon("mean_g").alias("mean_g"),
        canon("mean_b").alias("mean_b"))


# ===========================================================================
# Streaming (SURVEY.md §2.11)
# ===========================================================================


def _events_stream_dir(sf_dir: str) -> str:
    """Spark's file stream source needs a directory; expose events.parquet
    through a scratch dir symlink."""
    import os

    from aws_etl_bank_spark.plans.registry import _scratch

    d = _scratch(sf_dir, "events_stream/ignored").rsplit("/", 1)[0]
    link = os.path.join(d, "events.parquet")
    # absolute target: a relative sf_dir would otherwise create a link
    # that resolves relative to the link's OWN directory (broken), and
    # os.path.exists follows links — so the broken link looked absent
    # and the re-create crashed with FileExistsError (sf1 audit, r5)
    target = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    if os.path.lexists(link) and os.path.realpath(link) != os.path.realpath(target):
        os.remove(link)
    if not os.path.lexists(link):
        os.symlink(target, link)
    return d


@q("stream_window_counts", """
SELECT CAST(time_bucket(INTERVAL '6 hours', ts) AS TIMESTAMP) AS window_start,
       event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2""")
def stream_window_counts(spark, sf_dir):
    """Watermarked tumbling-window aggregation executed as a real
    Structured Streaming query (availableNow → memory sink), so the
    streaming path itself is under the correctness gate."""
    import time as _time

    from aws_etl_bank_spark.streaming import windowed_event_counts

    stream = events_stream(spark, _events_stream_dir(sf_dir))
    agg = windowed_event_counts(stream, "6 hours", watermark="12 hours")
    name = f"stream_win_{int(_time.time() * 1000) % 10_000_000}"
    query = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    query.awaitTermination()
    result = spark.table(name).collect()
    return spark.createDataFrame(result, spark.table(name).schema)


@q("stream_sessionize", """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL '6 hours' THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
g AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       CAST(min(ts) AS TIMESTAMP) AS session_start,
       CAST(max(ts) + INTERVAL '6 hours' AS TIMESTAMP) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM g GROUP BY user_id, sid""")
def stream_sessionize(spark, sf_dir):
    """Gap-based sessionization via the built-in ``session_window``
    (batch mode here — deterministic and oracle-checkable as a
    gaps-and-islands query; the streaming path of the same operator is
    exercised in tests with a watermark)."""
    from aws_etl_bank_spark.streaming import session_stats

    events = load_table(spark, sf_dir, "events")
    return session_stats(events, gap="6 hours")


@q("stream_stateful_counts", """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id""")
def stream_stateful_counts(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState) run as a REAL
    streaming query: per-user running counts carried in GroupState across
    micro-batches, update-mode memory sink.  The cumulative count is
    batch-partitioning-invariant — max per user == total — so the result
    is oracle-checkable despite the streaming execution."""
    import time as _time

    from aws_etl_bank_spark.streaming import stateful_user_counts

    stream = events_stream(spark, _events_stream_dir(sf_dir))
    counts = stateful_user_counts(stream)
    name = f"stateful_counts_{int(_time.time() * 1000) % 10_000_000}"
    query = (
        counts.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True).start()
    )
    query.awaitTermination()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )


@q("stream_tws_running_totals", """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
FROM events GROUP BY user_id""")
def stream_tws_running_totals(spark, sf_dir):
    """transformWithStateInPandas (Spark 4's arbitrary-stateful API,
    streaming/tws.py) run as a REAL streaming query: per-user running
    (count, cents) pairs in RocksDB-backed ValueState carried across
    micro-batches, update-mode memory sink.  Unblocked in r12 by the
    from-scratch vendored protobuf runtime
    (aws_etl_bank_spark/vendor/google/protobuf — the state protocol's
    wire format implemented from the public spec); the JVM state
    server parses our bytes with real protobuf, so this entry
    hash-checks the whole protocol.  Cumulative totals are
    batch-split-invariant: the final emitted row per user (max
    n_events) equals the batch aggregate.  State lives in the store —
    per key only two int64s round-trip per batch — so state scales
    with keys, not events: the 100 TB unbounded-stream shape."""
    import time as _time

    from aws_etl_bank_spark.streaming.tws import (
        ROCKSDB_PROVIDER, ensure_worker_protobuf, running_user_totals_tws)

    ensure_worker_protobuf(spark)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   ROCKSDB_PROVIDER)
    try:
        stream = events_stream(spark, _events_stream_dir(sf_dir))
        totals = running_user_totals_tws(stream)
        name = f"tws_totals_{int(_time.time() * 1000) % 10_000_000}"
        query = (totals.writeStream.format("memory").queryName(name)
                 .outputMode("update").trigger(availableNow=True).start())
        query.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                           prev)
    return (spark.table(name).groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"),
                 F.max_by("cents", "n_events").alias("cents")))


@q("stream_pyds_shard_source", """
WITH c AS (
  SELECT user_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM c GROUP BY user_id""")
def stream_pyds_shard_source(spark, sf_dir):
    """Custom PYTHON STREAMING source (Spark 4
    ``DataSourceStreamReader``, sources/pyds_stream.py) — the
    Kinesis-shaped shard/offset contract without the connector jar:
    events split into 4 ordered shards; ``latestOffset`` rate-limits
    each shard per micro-batch (so the run takes multiple batches and
    really exercises offset planning + commit), executors read ONLY
    their shard's row slice via pyarrow, and the memory sink must
    receive every record exactly once.  The per-user totals over the
    sink equal the batch aggregate — delivery bugs (loss, dupes,
    slice misalignment) fail the hash."""
    import time as _time

    from aws_etl_bank_spark.plans.registry import _scratch
    from aws_etl_bank_spark.sources.pyds_stream import (
        ShardedStreamDataSource, prepare_shards)

    try:
        spark.dataSource.register(ShardedStreamDataSource)
    except Exception:
        pass  # already registered in this session
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        .alias("cents"))
    path = _scratch(sf_dir, "pyds_stream_shards")
    total = prepare_shards(ev, path, shards=4, order_col="event_id")

    stream = (spark.readStream.format("sharded_stream")
              .option("path", path)
              .option("schema_ddl",
                      "event_id bigint, user_id bigint, cents bigint")
              # ~3 micro-batches per shard at any SF
              .option("maxRecordsPerBatch",
                      max(1, total // 4 // 3 + 1))
              .load())
    name = f"pyds_shard_{int(_time.time() * 1000) % 10_000_000}"
    query = (stream.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .trigger(processingTime="1 seconds").start())
    deadline = _time.time() + 300
    while _time.time() < deadline:
        if spark.table(name).count() >= total:
            break
        _time.sleep(0.5)
    query.stop()
    return (spark.table(name).groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum("cents").alias("cents")))


@q("stream_pyds_manifest_sink", """
WITH c AS (
  SELECT user_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM c GROUP BY user_id""")
def stream_pyds_manifest_sink(spark, sf_dir):
    """Custom PYTHON STREAMING SINK (Spark 4
    ``DataSourceStreamWriter``, sources/pyds_stream.py
    ManifestStreamWriter): the events stream lands in the
    manifest-committing sink — tasks stage jsonl files, the driver
    publishes an atomic per-batch manifest only after every task
    succeeded — and the verification reads back ONLY manifest-listed
    files.  Exactly-once all-or-nothing batch publication is the
    hash-checked property: per-user totals over the sink must equal
    the batch aggregate."""
    import time as _time

    from aws_etl_bank_spark.plans.registry import _scratch
    from aws_etl_bank_spark.sources.pyds_stream import (
        ShardedStreamDataSource, read_manifest_sink)

    try:
        spark.dataSource.register(ShardedStreamDataSource)
    except Exception:
        pass  # already registered in this session
    stream = events_stream(spark, _events_stream_dir(sf_dir)).select(
        "event_id", "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        .alias("cents"))
    stamp = int(_time.time() * 1000)
    sink = _scratch(sf_dir, f"pyds_manifest_sink_{stamp}")
    ck = _scratch(sf_dir, f"pyds_manifest_ck_{stamp}")
    q = (stream.writeStream.format("sharded_stream")
         .option("path", sink).option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    back = read_manifest_sink(
        spark, sink, "event_id bigint, user_id bigint, cents bigint")
    return (back.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum("cents").alias("cents")))


@q("stream_tws_minmax_rows", """
WITH c AS (
  SELECT user_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events)
SELECT user_id, MIN(cents) AS lo, MAX(cents) AS hi,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM c GROUP BY user_id""")
def stream_tws_minmax_rows(spark, sf_dir):
    """ROW-based ``transformWithState`` (streaming/tws.py
    user_minmax_tws_rows) — the non-pandas twin of
    transformWithStateInPandas, same RocksDB state machinery with Row
    iterators at the Python boundary: per-user running (min, max,
    count).  Completes the TWS API matrix next to the three pandas
    entries; same max-marker final-state contract."""
    import time as _time

    from aws_etl_bank_spark.streaming.tws import (
        ROCKSDB_PROVIDER, ensure_worker_protobuf, user_minmax_tws_rows)

    ensure_worker_protobuf(spark)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   ROCKSDB_PROVIDER)
    try:
        stream = events_stream(spark, _events_stream_dir(sf_dir))
        mm = user_minmax_tws_rows(stream)
        name = f"tws_mm_{int(_time.time() * 1000) % 10_000_000}"
        query = (mm.writeStream.format("memory").queryName(name)
                 .outputMode("update").trigger(availableNow=True).start())
        query.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                           prev)
    return (spark.table(name).groupBy("user_id")
            .agg(F.max_by("lo", "n_events").alias("lo"),
                 F.max_by("hi", "n_events").alias("hi"),
                 F.max("n_events").alias("n_events")))


@q("stream_tws_topk_list", """
WITH c AS (
  SELECT user_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT user_id, cents,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY cents DESC) AS rnk
  FROM c)
SELECT user_id, CAST(rnk AS BIGINT) AS rank, cents
FROM r WHERE rnk <= 3""")
def stream_tws_topk_list(spark, sf_dir):
    """transformWithState ListState surface (streaming/tws.py
    user_topk_values_tws): the per-user running top-3 cents list lives
    in RocksDB ListState (O(k) state per key), each batch re-emits the
    current top-k with a strictly-increasing n_seen marker, and the
    max-n_seen rows are the final top-k — batch-split-invariant.  The
    (rank, cents) pairs are deterministic under ties (equal values get
    consecutive ranks), so the DuckDB row_number oracle hash-matches
    despite its arbitrary tie ordering."""
    import time as _time

    from aws_etl_bank_spark.streaming.tws import (
        ROCKSDB_PROVIDER, ensure_worker_protobuf, user_topk_values_tws)

    ensure_worker_protobuf(spark)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   ROCKSDB_PROVIDER)
    try:
        stream = events_stream(spark, _events_stream_dir(sf_dir))
        topk = user_topk_values_tws(stream, k=3)
        name = f"tws_topk_{int(_time.time() * 1000) % 10_000_000}"
        query = (topk.writeStream.format("memory").queryName(name)
                 .outputMode("update").trigger(availableNow=True).start())
        query.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                           prev)
    from pyspark.sql import Window as W

    sunk = spark.table(name)
    mx = F.max("n_seen").over(W.partitionBy("user_id"))
    return (sunk.withColumn("_mx", mx)
            .where(F.col("n_seen") == F.col("_mx"))
            .select("user_id", "rank", "cents"))


@q("stream_tws_type_counts_map", """
SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY user_id, event_type""")
def stream_tws_type_counts_map(spark, sf_dir):
    """transformWithState MapState surface (streaming/tws.py
    user_type_counts_tws): per-(user, event_type) running counts in
    RocksDB MapState updated via getValue/updateValue, read back each
    batch through the PAGED map iterator protocol
    (StateResponseWithMapIterator) — the deepest exercise of the
    vendored protobuf codec.  Each batch emits the user's whole
    current map with an n_seen marker; max-n_seen rows per user are
    the final counts, batch-split-invariant."""
    import time as _time

    from aws_etl_bank_spark.streaming.tws import (
        ROCKSDB_PROVIDER, ensure_worker_protobuf, user_type_counts_tws)

    ensure_worker_protobuf(spark)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   ROCKSDB_PROVIDER)
    try:
        stream = events_stream(spark, _events_stream_dir(sf_dir))
        counts = user_type_counts_tws(stream)
        name = f"tws_map_{int(_time.time() * 1000) % 10_000_000}"
        query = (counts.writeStream.format("memory").queryName(name)
                 .outputMode("update").trigger(availableNow=True).start())
        query.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                           prev)
    from pyspark.sql import Window as W

    sunk = spark.table(name)
    mx = F.max("n_seen").over(W.partitionBy("user_id"))
    return (sunk.withColumn("_mx", mx)
            .where(F.col("n_seen") == F.col("_mx"))
            .select("user_id", "event_type", "n"))


@q("stream_foreach_batch", """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS sv
FROM events GROUP BY event_type""")
def stream_foreach_batch(spark, sf_dir):
    """forEachBatch micro-batch driver with persist/skip/retry policy
    (context.py:602-664).  Per-batch aggregates (kept UN-rounded per
    batch) roll up to batch-split-invariant per-type totals, so the result
    is oracle-checkable even though execution is micro-batched; the
    per-batch behavior itself is asserted in tests/test_streaming.py."""
    import time as _time

    import pyspark.sql.types as T

    from aws_etl_bank_spark.plans.registry import _scratch
    from aws_etl_bank_spark.streaming import for_each_batch

    stream = events_stream(spark, _events_stream_dir(sf_dir))
    collected: list = []

    def handle(batch_df, batch_id):
        rows = batch_df.groupBy("event_type").agg(
            F.count("*").alias("n"), F.sum("value").alias("sv")
        ).collect()
        collected.extend([(batch_id, r["event_type"], r["n"], r["sv"]) for r in rows])

    for_each_batch(stream, handle, {
        "windowSize": "1 seconds",
        # fresh checkpoint per run — a reused checkpoint would mark the
        # input files processed and yield an empty second run
        "checkpointLocation": _scratch(sf_dir, f"feb_ckpt_{int(_time.time() * 1000)}"),
        "availableNow": True,
    })
    schema = T.StructType([
        T.StructField("batch_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("sv", T.DoubleType()),
    ])
    per_batch = spark.createDataFrame(collected, schema)
    return per_batch.groupBy("event_type").agg(
        F.sum("n").alias("n"), F.round(F.sum("sv"), 2).alias("sv")
    )


@q("stream_sample_poll", """
SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type""")
def stream_sample_poll(spark, sf_dir):
    """Streaming sample (§2 row 77): sample_streaming_frame runs the
    events file stream into a memory sink and polls until
    recordPollingLimit rows arrive (reference context.py:553-599); the
    poll limit is set to the full table count so the sampled batch frame
    is deterministic and oracle-comparable after aggregation."""
    from aws_etl_bank_spark.streaming.runner import sample_streaming_frame

    stream_dir = _events_stream_dir(sf_dir)
    total = load_table(spark, sf_dir, "events").count()
    stream = events_stream(spark, stream_dir)
    sampled = sample_streaming_frame(
        spark, stream,
        {"windowSize": "1 seconds", "pollingTimeInMs": 60000,
         "recordPollingLimit": total})
    return sampled.groupBy("event_type").agg(F.count("*").alias("n"))


def _curation_oracle() -> str:
    """DuckDB mirror of the end-to-end curation pipeline: language-ID →
    quality score → filter → exact dedup, matching each stage's existing
    single-op oracle exactly."""
    from aws_etl_bank_spark.llm.text import STOPWORD_PROFILES

    entries = []
    for lang, profile in sorted(STOPWORD_PROFILES.items()):
        in_list = ", ".join(f"'{w}'" for w in profile)
        entries.append(
            "{'score': round(len(list_filter(words, x -> x IN (" + in_list
            + "))) / CAST(len(words) AS DOUBLE), 6), 'lang': '" + lang + "'}"
        )
    structs = ",\n      ".join(entries)
    return rf"""
WITH w AS (
  SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS words,
         length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_punct
  FROM documents
),
lang AS (
  SELECT doc_id, text, words, n_punct,
         list_max([
      {structs}
    ]) AS best
  FROM w
),
s AS (
  SELECT doc_id, text, best.lang AS predicted_lang,
         CAST(len(words) AS BIGINT) AS n_tokens,
         round(n_punct / CAST(length(text) AS DOUBLE), 4) AS punct_ratio,
         round(len(list_filter(words, x -> x IN {_EN})) / CAST(len(words) AS DOUBLE), 4)
             AS stopword_ratio
  FROM lang
),
qual AS (
  SELECT doc_id, text, predicted_lang, n_tokens,
         round((least(n_tokens / 100.0, 1.0) * 0.5 + least(stopword_ratio * 5.0, 1.0) * 0.3)
               * greatest(0.0, 1.0 - punct_ratio * 5.0)
               + 0.2 * greatest(0.0, 1.0 - punct_ratio * 5.0) + 0.000000001, 4) AS quality
  FROM s
)
SELECT MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS dup_count,
       MAX(quality) AS quality, MAX(n_tokens) AS n_tokens
FROM qual
WHERE predicted_lang = 'en' AND quality >= 0.5
GROUP BY text"""


@q("llm_curation_pipeline", _curation_oracle())
def llm_curation_pipeline(spark, sf_dir):
    """End-to-end training-data curation: language-ID → quality score →
    keep high-quality English → exact dedup (lowest doc_id survives, with
    duplicate counts).  One declarative flow: the language/quality stages
    are map-only column expressions over a single documents scan, and the
    dedup is one hash aggregation on the content — at 100 TB this is one
    shuffle total."""
    from aws_etl_bank_spark.llm import language_id, quality_score

    docs = load_table(spark, sf_dir, "documents")
    scored = quality_score(language_id(docs))
    kept = scored.filter((F.col("predicted_lang") == "en") & (F.col("quality") >= 0.5))
    return kept.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("dup_count"),
        F.max("quality").alias("quality"),
        F.max("n_tokens").alias("n_tokens"),
    ).drop("text")


@q("ann_ivf_trained_topk", _ANN_TOPK_INVARIANT_ORACLE)
def ann_ivf_trained_topk(spark, sf_dir):
    """IVF top-k with k-means|| trained centroids (the scale path's real
    configuration): distributed training returns only n_cells centers to
    the driver; the corpus shuffles once on cell id.  Converted from
    rows-only to the shape-contract invariant oracle (r15, see
    ``_ann_topk_invariants``); the training job itself still runs under
    the driver gate, and recall vs brute force is measured in PERF.md."""
    from aws_etl_bank_spark.llm import ivf_topk
    from aws_etl_bank_spark.llm.similarity import train_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_centroids(emb, n_cells=16, seed=7)
    out = ivf_topk(emb, emb.filter("vec_id < 5"), _ANN_K,
                   n_cells=16, nprobe=4, centroids=cents)
    return _ann_topk_invariants(
        out, emb.select("vec_id"), _ANN_K, "cosine",
        F.col("cosine").between(-1.0, 1.0))


@q("text_chunking", r"""
WITH w AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS words FROM documents
),
c AS (
  SELECT doc_id, len(words) AS n, words,
         unnest(range(1, greatest(len(words) - 8, 1) + 1, 56)) AS s
  FROM w
)
SELECT doc_id,
       CAST((s - 1) // 56 AS BIGINT) AS chunk_index,
       array_to_string(words[CAST(s AS INT):CAST(least(s + 63, n) AS INT)], ' ') AS chunk_text,
       CAST(least(n - s + 1, 64) AS BIGINT) AS chunk_tokens
FROM c""")
def text_chunking(spark, sf_dir):
    """Token-budget document chunking with overlap (64-word chunks,
    8-word overlap): the sequence-packing precursor of a training
    pipeline, as pure sequence/slice expressions."""
    from aws_etl_bank_spark.llm.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_words=64, overlap_words=8)


@q("text_pii_scrub", r"""
WITH a AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' contact bob@example.com'
              WHEN doc_id % 7 = 1 THEN text || ' call 555-123-4567'
              WHEN doc_id % 7 = 2 THEN text || ' from 192.168.10.42'
              ELSE text END AS text
  FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
    '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS text_scrubbed,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
  CAST(len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phones
FROM a""")
def text_pii_scrub(spark, sf_dir):
    """PII redaction (emails / IPv4s / phones) with per-category counts.
    The testdata corpus carries no PII, so deterministic cases are
    planted by doc_id — identically in Spark and the oracle — before the
    scrub runs.  Map-only regexp chain; scan-speed at any scale."""
    from aws_etl_bank_spark.llm.text import pii_scrub

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" contact bob@example.com")))
        .when(F.col("doc_id") % 7 == 1, F.concat(F.col("text"), F.lit(" call 555-123-4567")))
        .when(F.col("doc_id") % 7 == 2, F.concat(F.col("text"), F.lit(" from 192.168.10.42")))
        .otherwise(F.col("text")).alias("text"),
    )
    return pii_scrub(docs).select(
        "doc_id", "text_scrubbed", "n_emails", "n_ips", "n_phones")


@q("text_repetition", r"""
WITH a AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text || chr(10) || text
              WHEN doc_id % 3 = 1 THEN text || chr(10) || 'tail ' || doc_id
              ELSE text END AS text
  FROM documents),
w AS (SELECT doc_id, string_split(text, chr(10)) AS lines,
             string_split_regex(lower(text), '\s+') AS words FROM a)
SELECT doc_id,
  CAST(len(lines) AS BIGINT) AS n_lines,
  round(1.0 - len(list_distinct(lines)) / CAST(len(lines) AS DOUBLE) + 0.000000001, 4) AS dup_line_frac,
  round(list_sum(list_transform(lines, x -> CASE WHEN len(list_filter(lines, y -> y = x)) > 1 THEN length(x) ELSE 0 END))
        / CAST(nullif(list_sum(list_transform(lines, x -> length(x))), 0) AS DOUBLE) + 0.000000001, 4) AS dup_line_char_frac,
  round(1.0 - len(list_distinct(words)) / CAST(len(words) AS DOUBLE) + 0.000000001, 4) AS dup_word_frac
FROM w""")
def text_repetition(spark, sf_dir):
    """Gopher-style repetition signals (duplicate-line and duplicate-word
    fractions).  The corpus is single-line, so multi-line shapes are
    planted by doc_id — a fully duplicated line for one third, a unique
    tail line for another — identically in Spark and the oracle."""
    from aws_etl_bank_spark.llm.text import repetition_signals

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.col("text"), F.lit("\n"), F.col("text")))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.col("text"), F.lit("\ntail "), F.col("doc_id").cast("string")))
        .otherwise(F.col("text")).alias("text"),
    )
    return repetition_signals(docs).select(
        "doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac", "dup_word_frac")


@q("stratified_sample_lang", """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rk
  FROM documents) t WHERE rk <= 20""")
def stratified_sample_lang(spark, sf_dir):
    """Deterministic per-language quota sample (first 20 doc_ids per
    language): the corpus-balancing step of a data pipeline, one window
    shuffle on the stratum key."""
    from aws_etl_bank_spark.llm.text import stratified_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(docs, "lang", 20, order_col="doc_id")


@q("text_decontaminate", r"""
WITH w AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS words FROM documents
),
s AS (
  SELECT doc_id, unnest(
    CASE WHEN len(words) >= 3 THEN
      list_distinct([array_to_string(words[CAST(i AS INT):CAST(i + 2 AS INT)], ' ')
                     for i in range(1, len(words) - 1)])
    ELSE [array_to_string(words, ' ')] END) AS sh
  FROM w
),
bench AS (SELECT DISTINCT sh FROM s WHERE doc_id % 97 = 0),
sizes AS (SELECT doc_id, count(*) AS sz FROM s GROUP BY doc_id),
m AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_matched
      FROM s JOIN bench USING (sh) GROUP BY s.doc_id)
SELECT d.doc_id,
       COALESCE(n_matched, 0) AS n_matched_ngrams,
       COALESCE(round(n_matched / CAST(sz AS DOUBLE) + 0.000000001, 4), 0.0) AS matched_frac,
       COALESCE(round(n_matched / CAST(sz AS DOUBLE) + 0.000000001, 4), 0.0) >= 0.5 AS contaminated
FROM documents d
JOIN sizes USING (doc_id)
LEFT JOIN m USING (doc_id)""")
def text_decontaminate(spark, sf_dir):
    """Benchmark decontamination: every corpus document scored by its
    distinct-3-gram overlap against a planted 6-doc "benchmark" (doc_id %
    97 = 0 — the benchmark docs themselves plus their near-dups cross the
    0.5 matched-fraction flag; unrelated docs keep incidental low
    fractions).  Broadcast benchmark-shingle semi-join + one hash agg."""
    from aws_etl_bank_spark.llm import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return decontaminate(docs, bench, shingle_n=3, frac_threshold=0.5).select(
        "doc_id", "n_matched_ngrams", "matched_frac", "contaminated")


@q("token_budget_mix", r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS doc_tokens
  FROM documents),
c AS (
  SELECT doc_id, source, doc_tokens,
         CAST(sum(doc_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM t)
SELECT doc_id, source, doc_tokens, cum_tokens
FROM c WHERE cum_tokens - doc_tokens < 600""")
def token_budget_mix(spark, sf_dir):
    """Token-budget corpus mixing: per source, keep documents (by doc_id)
    until a 600-token budget is reached — the per-source quota step of a
    training-mix assembly.  One window shuffle on the stratum key."""
    from aws_etl_bank_spark.llm import token_budget_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return token_budget_sample(docs, "source", 600).select(
        "doc_id", "source", "doc_tokens", "cum_tokens")


@q("join_asof_purchase", """
SELECT l.event_id, l.user_id, l.ts,
       r.ts AS purchase_ts, r.value AS purchase_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN
     (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
ON l.user_id = r.user_id AND l.ts >= r.ts""")
def join_asof_purchase(spark, sf_dir):
    """As-of join (operators/joins.py): each click picks up the latest
    purchase at-or-before it per user — attribution, the canonical
    event-stream enrichment.  Beyond-reference (the reference has only
    equi-joins); checked against DuckDB's native ASOF JOIN.  Union +
    keyed window: ONE exchange, no join node (asserted in
    tests/test_joins.py)."""
    from aws_etl_bank_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value")
    return asof_join(clicks, purchases, on="user_id", left_ts="ts").select(
        "event_id", "user_id", "ts",
        F.col("ts_r").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )


@q("join_asof_bucketed", """
SELECT l.event_id, l.user_id, l.ts,
       r.ts AS purchase_ts, r.value AS purchase_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN
     (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
ON l.user_id = r.user_id AND l.ts >= r.ts""")
def join_asof_bucketed(spark, sf_dir):
    """The hot-key-splitting as-of variant: same attribution query as
    join_asof_purchase but with ``coarse_bucket_seconds`` set, so the
    window partitions by (user, day-bucket) and carries each bucket's
    final purchase forward — identical results (same DuckDB ASOF
    oracle), parallel within a hot user.  The 100 TB answer to "one
    user is 10% of the stream" (operators/joins.py)."""
    from aws_etl_bank_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value")
    return asof_join(clicks, purchases, on="user_id", left_ts="ts",
                     coarse_bucket_seconds=86400.0).select(
        "event_id", "user_id", "ts",
        F.col("ts_r").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )


@q("join_range_bands", """
SELECT c_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
FROM customer c JOIN orders o
  ON o.o_totalprice BETWEEN c.c_acctbal * 50 - 500 AND c.c_acctbal * 50 + 500
GROUP BY c_custkey""")
def join_range_bands(spark, sf_dir):
    """Range join (operators/joins.py): order prices matched into
    per-customer price bands — a point-in-interval join with NO equi
    key, which raw Spark plans as BroadcastNestedLoop (quadratic at
    scale).  The operator bucketizes both sides (width 1000 ~ the band
    width) and equi-joins on the bucket id; DuckDB's IEJoin is the
    oracle.  No-nested-loop plan asserted in tests/test_joins.py."""
    from aws_etl_bank_spark.operators.joins import range_join

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_acctbal") * 50 - 500).alias("lo"),
        (F.col("c_acctbal") * 50 + 500).alias("hi"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    return (
        range_join(orders, cust, "o_totalprice", "lo", "hi",
                   bucket_width=1000.0)
        .groupBy("c_custkey")
        .agg(F.count("*").cast("long").alias("n_orders"),
             F.min("o_totalprice").alias("min_price"),
             F.max("o_totalprice").alias("max_price"))
    )


@q("dedup_lines_c4", r"""
WITH a AS (
  SELECT doc_id,
         'COMMON HEADER' || chr(10) || text || chr(10) || 'footer ' || (doc_id % 5) AS text
  FROM documents),
s AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM a),
l AS (SELECT doc_id, unnest([{'pos': i, 'line': arr[i]}
                             for i in range(1, len(arr) + 1)]) AS pl FROM s),
f AS (SELECT doc_id, pl.pos AS pos, pl.line AS line FROM l),
k AS (SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
      FROM f WHERE length(line) >= 1),
kept AS (SELECT doc_id, pos, line FROM k WHERE rn = 1
         UNION ALL
         SELECT doc_id, pos, line FROM f WHERE length(line) < 1),
reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text2,
               CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM kept GROUP BY doc_id)
SELECT a.doc_id, coalesce(reb.text2, '') AS text,
       CAST(len(string_split(a.text, chr(10))) AS BIGINT) AS n_lines,
       CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept
FROM a LEFT JOIN reb USING (doc_id)""")
def dedup_lines_c4(spark, sf_dir):
    """C4/CCNet-style corpus-wide line dedup: every distinct line
    survives only at its first (doc_id, pos) occurrence; documents are
    reassembled from their surviving lines.  The corpus is single-line,
    so cross-document duplicates are planted identically in Spark and
    the oracle: a header shared by every document and one of five
    rotating footers.  Winner-per-line is min(struct(id, pos)) — hash
    agg with map-side combine, hub-line safe (no per-line window sort;
    asserted in tests/test_llm.py)."""
    from aws_etl_bank_spark.llm import line_dedup

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("COMMON HEADER\n"), F.col("text"),
                 F.lit("\nfooter "),
                 (F.col("doc_id") % 5).cast("string")).alias("text"),
    )
    return line_dedup(docs)


@q("stream_stream_join", """
SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
       p.event_id AS purchase_id, p.ts AS purchase_ts, p.value
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts - INTERVAL 12 HOURS AND p.ts <= c.ts""")
def stream_stream_join(spark, sf_dir):
    """Watermarked stream-stream interval join run as a REAL streaming
    query (two file-stream sources, append-mode memory sink,
    availableNow): purchases in the 12 h before each click, per user.
    The 45-day watermark exceeds the corpus span so no match is
    dropped and the append-mode result equals the batch inequality
    join DuckDB computes.  At scale the watermark horizon — not stream
    length — bounds the join state (streaming/joins.py)."""
    import time as _time

    from aws_etl_bank_spark.streaming.joins import stream_interval_join

    stream_dir = _events_stream_dir(sf_dir)

    def mkstream():
        return events_stream(spark, stream_dir)

    clicks = mkstream().filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts")
    purchases = mkstream().filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts", "value")
    joined = stream_interval_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        bound_before="12 HOURS", watermark="45 days",
    ).select(
        "click_id", "user_id", F.col("ts").alias("click_ts"),
        "purchase_id", F.col("ts_r").alias("purchase_ts"), "value")

    name = f"stream_ssj_{int(_time.time() * 1000) % 10_000_000}"
    query = (
        joined.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    query.awaitTermination()
    result = spark.table(name).collect()
    return spark.createDataFrame(result, spark.table(name).schema)


@q("stream_dedup_ids", """
SELECT event_id, event_type, user_id, ts, value FROM events""")
def stream_dedup_ids(spark, sf_dir):
    """Streaming first-arrival dedup run as a REAL streaming query: the
    event stream unioned with a second read of itself (every row
    duplicated) then dropDuplicates on event_id across micro-batches —
    the exactly-once ingestion pattern.  Exact-mode here (bounded
    replay); the watermarked horizon variant
    (dropDuplicatesWithinWatermark) is unit-tested."""
    import time as _time

    from aws_etl_bank_spark.streaming.joins import stream_dedup

    stream_dir = _events_stream_dir(sf_dir)

    def mkstream():
        return events_stream(spark, stream_dir).select(
            "event_id", "event_type", "user_id", "ts", "value")

    doubled = mkstream().unionByName(mkstream())
    deduped = stream_dedup(doubled, ["event_id"])
    name = f"stream_dd_{int(_time.time() * 1000) % 10_000_000}"
    query = (
        deduped.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    query.awaitTermination()
    result = spark.table(name).collect()
    return spark.createDataFrame(result, spark.table(name).schema)


@q("mix_upsample_by_weight", """
WITH d AS (
  SELECT doc_id, source,
         CASE WHEN source = 'src0'
                THEN 2 + CASE WHEN doc_id % 10 < 5 THEN 1 ELSE 0 END
              WHEN source = 'src1'
                THEN CASE WHEN doc_id % 10 < 3 THEN 1 ELSE 0 END
              WHEN source = 'src2' THEN 0
              ELSE 1 END AS n
  FROM documents)
SELECT doc_id, source, CAST(unnest(range(n)) AS INT) AS copy
FROM d WHERE n > 0""")
def mix_upsample_by_weight(spark, sf_dir):
    """Deterministic fractional upsampling (llm/text.py
    upsample_by_weight): src0 ×2.5, src1 ×0.3, src2 dropped, everything
    else ×1 — the epochs-per-source step of assembling a training mix,
    reproducible with no randomness (the fractional share picks rows by
    doc_id modulus).  Map-side explode, zero shuffles."""
    from aws_etl_bank_spark.llm import upsample_by_weight

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return upsample_by_weight(
        docs, "source", {"src0": 2.5, "src1": 0.3, "src2": 0.0})


@q("ann_ivf_planted_twin", """
SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
       CAST(1 AS BIGINT) AS rank, CAST(1.0 AS DOUBLE) AS cosine
FROM embeddings WHERE vec_id < 5""")
def ann_ivf_planted_twin(spark, sf_dir):
    """Oracle-checked projection of IVF ANN (llm/similarity.py): plant an
    exact twin (vec_id + 1e6) of each of the 5 query vectors into the
    corpus — identical vectors land in the SAME cell, the query's own
    cell is always its first probe, and no organic pair in this
    embedding set exceeds cosine ~0.51, so the top-1 neighbor must be
    the twin at cosine 1.0.  A failure here means cell assignment and
    probing disagree — the IVF recall property that the rows-only
    ann_ivf_topk cannot prove to the driver."""
    from aws_etl_bank_spark.llm.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5)
    twins = queries.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    corpus = emb.unionByName(twins)
    return ivf_topk(corpus, queries, k=1, n_cells=16, nprobe=4)


_BM25_ORACLE_BODY = """
toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
    FROM documents) WHERE t <> ''
),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                 (SELECT avg(doclen) FROM dl) AS avgdl),
tf AS (SELECT doc_id, t, count(*) AS tf FROM toks
       WHERE t IN ('spark', 'join', 'window') GROUP BY doc_id, t),
dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
scored AS (
  SELECT tf.doc_id,
         round(sum(ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / stats.avgdl))), 4) AS score,
         CAST(count(DISTINCT tf.t) AS BIGINT) AS n_terms
  FROM tf JOIN dfq USING (t) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id)"""


@q("text_bm25_rank", "WITH " + _BM25_ORACLE_BODY + """
SELECT doc_id, score, n_terms FROM scored""")
def text_bm25_rank(spark, sf_dir):
    """Okapi BM25 (llm/ranking.py) of every document against the probe
    query ['spark','join','window'] — scores and distinct-term hits,
    reproduced term-for-term by the DuckDB oracle (same tokenizer, same
    Lucene-variant idf, k1=1.2 b=0.75, rounded to 4)."""
    from aws_etl_bank_spark.llm.ranking import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    return bm25_scores(docs, ["spark", "join", "window"])


@q("text_bm25_topk", "WITH " + _BM25_ORACLE_BODY + """
SELECT doc_id, score, n_terms FROM scored
ORDER BY score DESC, doc_id LIMIT 20""")
def text_bm25_topk(spark, sf_dir):
    """Global BM25 top-20 (TakeOrdered — no full sort shuffle),
    deterministic because ties on the rounded score break by doc_id on
    both engines."""
    from aws_etl_bank_spark.llm.ranking import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, ["spark", "join", "window"], k=20)


@q("stream_static_enrich", """
SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events JOIN nation ON user_id % 25 = n_nationkey
GROUP BY 1""")
def stream_static_enrich(spark, sf_dir):
    """Stream-static dimension enrichment (streaming/joins.py
    enrich_with_static) run as a REAL streaming query: events stream ⋈
    broadcast nation dim (stateless, no watermark needed) → complete-mode
    aggregate → memory sink.  Oracle is the batch equivalent."""
    import time as _time

    from aws_etl_bank_spark.streaming.joins import enrich_with_static

    stream = (events_stream(spark, _events_stream_dir(sf_dir))
              .withColumn("__nk", F.col("user_id") % 25))
    dim = (load_table(spark, sf_dir, "nation")
           .select(F.col("n_nationkey").alias("__nk"), "n_name"))
    enriched = enrich_with_static(stream, dim, "__nk")
    agg = enriched.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    name = f"stream_enrich_{int(_time.time() * 1000) % 10_000_000}"
    query = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    query.awaitTermination()
    result = spark.table(name).collect()
    return spark.createDataFrame(result, spark.table(name).schema)


@q("dedup_semantic_pairs_full")  # rows-only: near-dup recall is
# cell-assignment-dependent (SemDeDup semantics); the oracle-checked
# planted projection is dedup_semantic_pairs
def dedup_semantic_pairs_full(spark, sf_dir):
    """Whole-table semantic near-dup pairs (no copy-0 pin, so on
    make_sf-upscaled data the ~0.997-cosine cross-copy near-dups are
    real work) — the SCALING variant benched in bench.py; n_cells grows
    with the corpus per the n_cells ≈ N / target_cell_rows rule.

    A deterministic jittered slice (vec_id < 200, each coordinate scaled
    by 1 + 0.02·((i mod 7) − 3)/3, new ids +2e6) is unioned in so the
    result is NON-EMPTY at every SF: the base sf0.01 table has no
    organic ≥0.95-cosine pairs, and a 0-row driver record proves nothing
    (round-5 verdict).  The jitter keeps cosine ≈ 0.9998 — a genuine
    near-dup exercising the within-cell cosine path, not an exact twin
    shortcut.  The jitter CAN move a handful of vectors across
    near-equidistant centroid boundaries — that recall loss is SemDeDup
    semantics, and ``dedup_semantic_full_recall`` is the oracle-checked
    companion pinning found == co-cell for every planted pair."""
    from aws_etl_bank_spark.llm import semantic_dedup_pairs

    emb = _semantic_full_fixture(spark, sf_dir)
    n = emb.count()
    n_cells = max(16, n // 250)
    return semantic_dedup_pairs(emb, "embedding", "vec_id",
                                n_cells=n_cells, cosine_threshold=0.95)


def _semantic_full_fixture(spark, sf_dir):
    """The dedup_semantic_pairs_full fixture: corpus ∪ jittered slice."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    jitter = (
        emb.filter(F.col("vec_id") < 200)
        .select((F.col("vec_id") + 2_000_000).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: (x * (1.0 + 0.02 * ((i % 7) - 3) / 3.0)
                                  ).cast("float")).alias("embedding"))
    )
    return emb.unionByName(jitter)


@q("dedup_semantic_full_recall", """
SELECT CAST(count(*) AS BIGINT) AS n_planted,
       CAST(197 AS BIGINT) AS n_co_cell,
       CAST(197 AS BIGINT) AS n_found,
       CAST(0 AS BIGINT) AS n_mismatch
FROM embeddings WHERE vec_id < 200""")
def dedup_semantic_full_recall(spark, sf_dir):
    """The checkable companion of ``dedup_semantic_pairs_full`` (r6
    verdict item 1): SemDeDup's recall contract is *within-cell recall
    = 1*, i.e. a planted pair (v, v+2e6, cosine ≈ 0.9998) appears in
    the output IF AND ONLY IF the jitter left both vectors in the same
    k-means cell.  Plain containment of all 200 planted pairs would be
    WRONG — the 2% coordinate jitter legitimately moves a few vectors
    across near-equidistant centroid boundaries (3 of 200 at sf0.01),
    which is exactly the recall loss SemDeDup trades for never
    comparing corpus²; found ≠ co-cell, in either direction, is the
    bug (a dropped cell, a broken join, a cosine error).

    One row: ``n_planted`` (SQL-derivable), ``n_co_cell`` / ``n_found``
    (pinned fixture constants — the cell assignment is a deterministic
    function of the committed testdata at the driver's sf0.01; like
    ``testdata_schema_smoke``, the pins do not transfer to other SFs
    and ``testdata_schema_smoke`` tripwires regeneration), and the
    invariant ``n_mismatch = 0``
    computed Spark-side from the SAME run's pairs and cell
    assignments.  The rows-only ``_full`` sibling stays as the benched
    scaling form."""
    from aws_etl_bank_spark.llm import semantic_dedup_pairs
    from aws_etl_bank_spark.llm.dedup import assign_cells

    emb = _semantic_full_fixture(spark, sf_dir)
    n = emb.count()
    n_cells = max(16, n // 250)
    pairs = semantic_dedup_pairs(emb, "embedding", "vec_id",
                                 n_cells=n_cells, cosine_threshold=0.95)
    cells = assign_cells(emb, "embedding", "vec_id",
                         n_cells=n_cells).select("vec_id", "cell_id")
    planted = (emb.filter(F.col("vec_id") < 200)
               .select(F.col("vec_id").alias("id_a"),
                       (F.col("vec_id") + 2_000_000).alias("id_b")))
    ca = cells.select(F.col("vec_id").alias("id_a"),
                      F.col("cell_id").alias("__cell_a"))
    cb = cells.select(F.col("vec_id").alias("id_b"),
                      F.col("cell_id").alias("__cell_b"))
    hit = pairs.select("id_a", "id_b").withColumn("__hit", F.lit(1))
    status = (planted.join(ca, "id_a").join(cb, "id_b")
              .join(hit, ["id_a", "id_b"], "left")
              .select((F.col("__cell_a") == F.col("__cell_b"))
                      .cast("int").alias("__co"),
                      F.coalesce("__hit", F.lit(0)).alias("__found")))
    return status.agg(
        F.count(F.lit(1)).alias("n_planted"),
        F.sum("__co").cast("long").alias("n_co_cell"),
        F.sum("__found").cast("long").alias("n_found"),
        F.sum((F.col("__co") != F.col("__found")).cast("long"))
        .alias("n_mismatch"))


@q("text_decontaminate_semantic", """
SELECT vec_id, CAST(1 AS BIGINT) AS n_matches, CAST(1.0 AS DOUBLE) AS max_cosine
FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 100000000""")
def text_decontaminate_semantic(spark, sf_dir):
    """Embedding-space decontamination (llm/dedup.py
    decontaminate_semantic): benchmark = every 20th corpus vector, so
    the contaminated set is provably exactly those rows (identical
    vector ⇒ co-cell ⇒ cosine 1.0; organic max ≈ 0.51 is far below the
    0.95 threshold).  Copy-0 pinned like the other embedding fixtures."""
    from aws_etl_bank_spark.llm import decontaminate_semantic

    emb = (load_table(spark, sf_dir, "embeddings")
           .filter(F.col("vec_id") < 100_000_000)
           .select("vec_id", "embedding"))
    bench = emb.filter(F.col("vec_id") % 20 == 0)
    return decontaminate_semantic(emb, bench, "embedding", "vec_id",
                                  n_cells=16, cosine_threshold=0.95)


@q("ann_pq_planted_twin", """
SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
       CAST(1 AS BIGINT) AS rank, CAST(0.0 AS DOUBLE) AS adc_dist
FROM embeddings WHERE vec_id < 5""")
def ann_pq_planted_twin(spark, sf_dir):
    """Oracle-checked projection of product-quantization ANN
    (llm/similarity.py pq_topk): plant an exact twin (vec_id + 1e6) of
    each of the 5 query vectors into the corpus.  A twin encodes to the
    query's own argmin codes, so its ADC distance is provably the global
    minimum — and because the stand-in codebooks are built from the
    n_codes lowest-id vectors (which include the queries), that minimum
    is exactly 0.0.  No organic vector shares all m codes with a query
    on this embedding set (verified across SFs), so top-1 must be the
    twin.  Copy-0 pinned like the other planted-embedding fixtures."""
    from aws_etl_bank_spark.llm.similarity import pq_codebooks, pq_topk

    emb = (load_table(spark, sf_dir, "embeddings")
           .filter(F.col("vec_id") < 100_000_000)
           .select("vec_id", "embedding"))
    queries = emb.filter(F.col("vec_id") < 5)
    twins = queries.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    corpus = emb.unionByName(twins)
    cb = pq_codebooks(corpus, dim=64, m=8, n_codes=16)
    return pq_topk(corpus, queries, k=1, codebooks=cb)


@q("ann_pq_topk", _ANN_TOPK_INVARIANT_ORACLE)
def ann_pq_topk(spark, sf_dir):
    """PQ-ADC top-10 over the full embeddings table: corpus compressed
    to m=8 one-byte codes per vector (32x smaller than the raw floats),
    scored by m lookup-table reads per candidate.  The scale path when
    even IVF's probed cells are too wide to scan as raw floats.
    Converted from rows-only to the shape-contract invariant oracle
    (r15, see ``_ann_topk_invariants``; ADC squared-L2 is
    non-negative); neighbor-level exactness is pinned by the
    planted-twin companion ann_pq_planted_twin."""
    from aws_etl_bank_spark.llm.similarity import pq_codebooks, pq_topk

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb = pq_codebooks(emb, dim=64, m=8, n_codes=16)
    out = pq_topk(emb, emb.filter(F.col("vec_id") < 5), _ANN_K, cb)
    return _ann_topk_invariants(
        out, emb.select("vec_id"), _ANN_K, "adc_dist",
        F.col("adc_dist") >= 0.0)


@q("stream_cdc_scd2", """
WITH r AS (SELECT user_id, event_type, value,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
SELECT user_id, event_type AS last_event_type, ROUND(value, 2) AS balance
FROM r WHERE rn = 1""")
def stream_cdc_scd2(spark, sf_dir):
    """Streaming CDC apply (streaming/cdc.py): the events table split
    into 3 ts-ranged files replayed as a 1-file-per-trigger change
    stream, each micro-batch MERGED into a versioned SCD2 dim keyed by
    user_id.  The stale-change guard makes the final ACTIVE rows
    batch-split- and arrival-order-invariant — exactly the
    max-(ts, event_id) change per key, which is what the oracle checks;
    per-batch history semantics are asserted in tests/test_streaming.py."""
    import time as _time

    from aws_etl_bank_spark.plans.registry import _scratch
    from aws_etl_bank_spark.streaming.cdc import cdc_apply_scd2

    events = load_table(spark, sf_dir, "events")
    feed_dir = _scratch(sf_dir, "cdc_feed")
    import os as _os
    success = _os.path.join(feed_dir, "_SUCCESS")
    src = _os.path.realpath(_os.path.join(sf_dir, "events.parquet"))
    stale = (not _os.path.exists(success)
             or (_os.path.exists(src)
                 and _os.path.getmtime(src) > _os.path.getmtime(success)))
    if stale:
        # the 3-file ts-ranged feed is a deterministic function of the
        # source table — write it once per sf_dir (re-written only when
        # the source parquet's mtime moves, e.g. a driver testdata
        # regeneration), not once per run
        events.repartitionByRange(3, "ts").write.mode("overwrite").parquet(feed_dir)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(feed_dir))
    run_tag = int(_time.time() * 1000)
    dim = cdc_apply_scd2(
        stream, _scratch(sf_dir, f"cdc_state_{run_tag}"), key="user_id",
        value_cols=["value", "event_type"],
        checkpoint=_scratch(sf_dir, f"cdc_ckpt_{run_tag}"))
    return (dim.filter(F.col("is_active"))
            .select("user_id", F.col("event_type").alias("last_event_type"),
                    F.round("value", 2).alias("balance")))


@q("text_gopher_filter", rf"""
WITH a AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text || chr(10) || text
              WHEN doc_id % 3 = 1 THEN text || chr(10) || 'tail ' || doc_id
              ELSE text END AS text
  FROM documents),
w AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines,
             string_split_regex(lower(text), '\s+') AS words FROM a),
s AS (SELECT doc_id,
        CAST(len(words) AS BIGINT) AS n_tokens,
        round(length(text) / CAST(len(words) AS DOUBLE), 4) AS avg_token_len,
        round((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
              / CAST(length(text) AS DOUBLE), 4) AS punct_ratio,
        round(len(list_filter(words, x -> x IN {_EN})) / CAST(len(words) AS DOUBLE), 4)
            AS stopword_ratio,
        round(1.0 - len(list_distinct(lines)) / CAST(len(lines) AS DOUBLE) + 0.000000001, 4)
            AS dup_line_frac,
        round(1.0 - len(list_distinct(words)) / CAST(len(words) AS DOUBLE) + 0.000000001, 4)
            AS dup_word_frac
      FROM w)
SELECT doc_id,
  n_tokens BETWEEN 50 AND 100000 AS pass_length,
  avg_token_len BETWEEN 3.0 AND 10.0 AS pass_word_len,
  stopword_ratio >= 0.06 AS pass_stopwords,
  punct_ratio <= 0.20 AS pass_punct,
  (dup_line_frac <= 0.30 AND dup_word_frac <= 0.20) AS pass_repetition,
  (n_tokens BETWEEN 50 AND 100000 AND avg_token_len BETWEEN 3.0 AND 10.0
   AND stopword_ratio >= 0.06 AND punct_ratio <= 0.20
   AND dup_line_frac <= 0.30 AND dup_word_frac <= 0.20) AS keep
FROM s""")
def text_gopher_filter(spark, sf_dir):
    """Gopher-rule document filter (llm/text.py gopher_filter): per-rule
    booleans + conjunctive keep, reproduced rule-for-rule by the oracle
    over the SAME planted multi-line corpus as text_repetition (the
    organic docs are single-line, which would leave the repetition caps
    trivially true)."""
    from aws_etl_bank_spark.llm import gopher_filter

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.col("text"), F.lit("\n"), F.col("text")))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.col("text"), F.lit("\ntail "), F.col("doc_id").cast("string")))
        .otherwise(F.col("text")).alias("text"),
    )
    return gopher_filter(docs).select(
        "doc_id", "pass_length", "pass_word_len", "pass_stopwords",
        "pass_punct", "pass_repetition", "keep")


@q("ann_ivfpq_planted_twin", """
SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
       CAST(1 AS BIGINT) AS rank, CAST(0.0 AS DOUBLE) AS adc_dist
FROM embeddings WHERE vec_id < 5""")
def ann_ivfpq_planted_twin(spark, sf_dir):
    """IVF+PQ composed (llm/similarity.py ivf_pq_topk — the FAISS IVFPQ
    layout): identical twin vectors land in the query's own first-probed
    cell (IVF recall property) AND share the query's argmin codes (PQ
    minimality property), so top-1 must be the twin at ADC 0.0.  One
    entry proves both halves of the composition agree."""
    from aws_etl_bank_spark.llm.similarity import ivf_pq_topk, pq_codebooks

    emb = (load_table(spark, sf_dir, "embeddings")
           .filter(F.col("vec_id") < 100_000_000)
           .select("vec_id", "embedding"))
    queries = emb.filter(F.col("vec_id") < 5)
    twins = queries.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    corpus = emb.unionByName(twins)
    cb = pq_codebooks(corpus, dim=64, m=8, n_codes=16)
    return ivf_pq_topk(corpus, queries, k=1, codebooks=cb,
                       n_cells=16, nprobe=4)


@q("dedup_fuzzy_ed1_pairs", """
WITH n AS (SELECT c_custkey AS id, c_name AS name FROM customer),
var AS (
  SELECT id, name,
         unnest(list_prepend(name,
            list_transform(generate_series(1, length(name)),
                           i -> substr(name, 1, i-1) || substr(name, i+1)))) AS v
  FROM n),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM var a JOIN var b ON a.v = b.v AND a.id < b.id),
pairs AS (
  SELECT c.id_a, c.id_b,
         levenshtein(na.name, nb.name) AS dist
  FROM cand c JOIN n na ON na.id = c.id_a JOIN n nb ON nb.id = c.id_b
  WHERE levenshtein(na.name, nb.name) <= 1)
SELECT id_a % 997 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(SUM(dist) AS BIGINT) AS sum_dist,
       CAST(SUM(id_a) AS BIGINT) AS sum_ida,
       CAST(SUM(id_b) AS BIGINT) AS sum_idb,
       CAST(SUM((id_a * 31 + id_b) % 1000003) AS BIGINT) AS chk
FROM pairs GROUP BY bucket""")
def dedup_fuzzy_ed1_pairs(spark, sf_dir):
    """Fuzzy string self-join at edit distance ≤ 1 over the FULL corpus
    (llm/dedup.py fuzzy_pairs_ed1): SymSpell symmetric-delete blocking —
    each name expands to its single-deletion variants, pairs meet in a
    variant-hash equi-join, the exact levenshtein verify removes
    hash-block false positives.  Candidate generation is provably
    lossless for ed ≤ 1 (delete the edited position from both sides),
    so the blocked join equals an O(n²) levenshtein self-join while
    shuffling only O(rows × len) variant keys.

    r15 verdict task 4 (retiring the sf1 audit exclusion): the oracle
    used to BE that O(n²) self-join — 2.25 B levenshtein calls at sf1 —
    so this entry was the standing audit carve-out.  It now mirrors the
    same provably-lossless deletion-variant blocking in DuckDB SQL
    (list_transform/generate_series; exact `levenshtein ≤ 1` verify
    kept), and tests/test_verify_gate.py pins blocked-oracle ≡
    brute-force-oracle inside DuckDB at sf0.001/sf0.01, so the ground
    truth stays anchored to the quadratic definition while the audit
    runs the full corpus at every SF.  Output is a bucketed multiset
    checksum of ALL pairs (count / exact-dup count / distance mass /
    id sums / a positional hash per `id_a % 997` bucket) rather than
    the 26.9 M literal sf1 pair rows — the gate's exact-compare stays
    O(buckets) while any single dropped, extra, or altered pair still
    flips `chk`; the literal-pair surface with row-level compare is
    the bounded companion ``dedup_fuzzy_ed1_planted``."""
    from aws_etl_bank_spark.llm.dedup import fuzzy_pairs_ed1

    c = load_table(spark, sf_dir, "customer")
    p = fuzzy_pairs_ed1(c, "c_name", "c_custkey")
    return (p.groupBy((F.col("id_a") % 997).alias("bucket"))
            .agg(F.count("*").cast("long").alias("n_pairs"),
                 F.sum(F.when(F.col("dist") == 0, 1).otherwise(0))
                  .cast("long").alias("n_exact"),
                 F.sum("dist").cast("long").alias("sum_dist"),
                 F.sum("id_a").cast("long").alias("sum_ida"),
                 F.sum("id_b").cast("long").alias("sum_idb"),
                 F.sum((F.col("id_a") * 31 + F.col("id_b")) % 1000003)
                  .cast("long").alias("chk")))


@q("text_pack_sequences", """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(SUM(len(string_split(text, ' ')))
                OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)
            - len(string_split(text, ' ')) AS BIGINT) AS start_tok,
       CAST((SUM(len(string_split(text, ' ')))
                OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)
            - len(string_split(text, ' '))) // 2048 AS BIGINT) AS pack_id,
       CAST((SUM(len(string_split(text, ' ')))
                OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)
            - len(string_split(text, ' '))) % 2048 AS BIGINT) AS pack_offset
FROM documents""")
def text_pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing for training prep (llm/text.py
    pack_sequences): documents in doc_id order laid head-to-head into
    2048-token sequences; each doc gets its sequence index and offset.
    The oracle is one global cumulative-sum window; the engine computes
    the identical stream positions with a TWO-PHASE prefix sum
    (range-partitioned local cumsum + tiny per-shard offset join), so no
    single task ever sees more than one shard — the difference between a
    one-reducer sort and full parallelism at corpus scale."""
    from aws_etl_bank_spark.llm.text import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    docs = docs.withColumn("__nt", F.size(F.split(F.col("text"), " ")))
    return pack_sequences(docs, "doc_id", "__nt", seq_len=2048).select(
        "doc_id", "n_tokens", "start_tok", "pack_id", "pack_offset")


@q("dedup_fuzzy_entity_ids", """
WITH nodes AS MATERIALIZED (
  SELECT c_custkey AS id, c_name AS name FROM customer WHERE c_custkey % 3 = 0),
var AS (
  SELECT id, name,
         unnest(list_prepend(name,
            list_transform(generate_series(1, length(name)),
                           i -> substr(name, 1, i-1) || substr(name, i+1)))) AS v
  FROM nodes),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM var a JOIN var b ON a.v = b.v AND a.id < b.id),
ed0 AS (
  SELECT c.id_a, c.id_b FROM cand c
  JOIN nodes na ON na.id = c.id_a JOIN nodes nb ON nb.id = c.id_b
  WHERE levenshtein(na.name, nb.name) <= 1),
ed AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM ed0
  UNION ALL SELECT id_b AS src, id_a AS dst FROM ed0),
l0 AS MATERIALIZED (SELECT id, id AS lb FROM nodes),
l1 AS MATERIALIZED (
  SELECT v.id, LEAST(v.lb, coalesce(nb.m, v.lb), coalesce(j.lb, v.lb)) AS lb
  FROM l0 v
  LEFT JOIN (SELECT e.src AS id, MIN(l.lb) AS m
             FROM ed e JOIN l0 l ON l.id = e.dst GROUP BY e.src) nb
    ON nb.id = v.id
  LEFT JOIN l0 j ON j.id = v.lb),
l2 AS MATERIALIZED (
  SELECT v.id, LEAST(v.lb, coalesce(nb.m, v.lb), coalesce(j.lb, v.lb)) AS lb
  FROM l1 v
  LEFT JOIN (SELECT e.src AS id, MIN(l.lb) AS m
             FROM ed e JOIN l1 l ON l.id = e.dst GROUP BY e.src) nb
    ON nb.id = v.id
  LEFT JOIN l1 j ON j.id = v.lb),
l3 AS MATERIALIZED (
  SELECT v.id, LEAST(v.lb, coalesce(nb.m, v.lb), coalesce(j.lb, v.lb)) AS lb
  FROM l2 v
  LEFT JOIN (SELECT e.src AS id, MIN(l.lb) AS m
             FROM ed e JOIN l2 l ON l.id = e.dst GROUP BY e.src) nb
    ON nb.id = v.id
  LEFT JOIN l2 j ON j.id = v.lb),
l4 AS MATERIALIZED (
  SELECT v.id, LEAST(v.lb, coalesce(nb.m, v.lb), coalesce(j.lb, v.lb)) AS lb
  FROM l3 v
  LEFT JOIN (SELECT e.src AS id, MIN(l.lb) AS m
             FROM ed e JOIN l3 l ON l.id = e.dst GROUP BY e.src) nb
    ON nb.id = v.id
  LEFT JOIN l3 j ON j.id = v.lb),
l5 AS MATERIALIZED (
  SELECT v.id, LEAST(v.lb, coalesce(nb.m, v.lb), coalesce(j.lb, v.lb)) AS lb
  FROM l4 v
  LEFT JOIN (SELECT e.src AS id, MIN(l.lb) AS m
             FROM ed e JOIN l4 l ON l.id = e.dst GROUP BY e.src) nb
    ON nb.id = v.id
  LEFT JOIN l4 j ON j.id = v.lb),
l6 AS MATERIALIZED (
  SELECT v.id, LEAST(v.lb, coalesce(nb.m, v.lb), coalesce(j.lb, v.lb)) AS lb
  FROM l5 v
  LEFT JOIN (SELECT e.src AS id, MIN(l.lb) AS m
             FROM ed e JOIN l5 l ON l.id = e.dst GROUP BY e.src) nb
    ON nb.id = v.id
  LEFT JOIN l5 j ON j.id = v.lb),
l7 AS MATERIALIZED (
  SELECT v.id, LEAST(v.lb, coalesce(nb.m, v.lb), coalesce(j.lb, v.lb)) AS lb
  FROM l6 v
  LEFT JOIN (SELECT e.src AS id, MIN(l.lb) AS m
             FROM ed e JOIN l6 l ON l.id = e.dst GROUP BY e.src) nb
    ON nb.id = v.id
  LEFT JOIN l6 j ON j.id = v.lb),
l8 AS MATERIALIZED (
  SELECT v.id, LEAST(v.lb, coalesce(nb.m, v.lb), coalesce(j.lb, v.lb)) AS lb
  FROM l7 v
  LEFT JOIN (SELECT e.src AS id, MIN(l.lb) AS m
             FROM ed e JOIN l7 l ON l.id = e.dst GROUP BY e.src) nb
    ON nb.id = v.id
  LEFT JOIN l7 j ON j.id = v.lb),
l9 AS MATERIALIZED (
  SELECT v.id, LEAST(v.lb, coalesce(nb.m, v.lb), coalesce(j.lb, v.lb)) AS lb
  FROM l8 v
  LEFT JOIN (SELECT e.src AS id, MIN(l.lb) AS m
             FROM ed e JOIN l8 l ON l.id = e.dst GROUP BY e.src) nb
    ON nb.id = v.id
  LEFT JOIN l8 j ON j.id = v.lb),
l10 AS MATERIALIZED (
  SELECT v.id, LEAST(v.lb, coalesce(nb.m, v.lb), coalesce(j.lb, v.lb)) AS lb
  FROM l9 v
  LEFT JOIN (SELECT e.src AS id, MIN(l.lb) AS m
             FROM ed e JOIN l9 l ON l.id = e.dst GROUP BY e.src) nb
    ON nb.id = v.id
  LEFT JOIN l9 j ON j.id = v.lb)
SELECT CAST(id AS BIGINT) AS id, CAST(lb AS BIGINT) AS component FROM l10""")
def dedup_fuzzy_entity_ids(spark, sf_dir):
    """Entity resolution end-to-end: SymSpell ed≤1 fuzzy pairs
    (llm/dedup.py fuzzy_pairs_ed1) fed into iterative connected
    components, one canonical entity id (min member id) per transitive
    similarity cluster — the record-linkage composition
    (block → match → cluster) on real name data, where the cluster
    structure is data-driven rather than planted.

    r15 verdict task 4 (retiring the sf1 audit exclusion): the old
    oracle built the edge list with an O(n²) levenshtein cross join and
    closed it with a recursive min-label CTE whose `reach` set is
    |component|² rows — at sf1 the graph fuses into ONE 50 k-node
    component (measured), i.e. 2.5 B reach rows on top of 2.25 B
    levenshtein calls.  The oracle now (a) generates edges with the
    same provably-lossless deletion-variant blocking as the pairs
    entry (exact `levenshtein ≤ 1` verify kept; tests pin blocked ≡
    brute-force edge sets in DuckDB), and (b) closes labels with 10
    unrolled MATERIALIZED min-label rounds, each round taking
    `LEAST(own, min-over-neighbours, label-of-label)` — the
    pointer-doubling step makes convergence logarithmic in component
    diameter (sf0.01 converges in 7 rounds, sf1 in 8 — measured; two
    spare rounds of margin, and tests/test_verify_gate.py pins
    round-9 ≡ round-10 at the driver SF so a non-converged oracle
    cannot ship).  `AS MATERIALIZED` is load-bearing: DuckDB 1.0
    inlines multiply-referenced CTEs, which re-expands the whole
    chain 3^10 times without it."""
    from aws_etl_bank_spark.llm.dedup import connected_components, fuzzy_pairs_ed1

    c = (load_table(spark, sf_dir, "customer")
         .where(F.col("c_custkey") % 3 == 0))
    pairs = fuzzy_pairs_ed1(c, "c_name", "c_custkey").select("id_a", "id_b")
    selfp = c.select(F.col("c_custkey").alias("id_a"),
                     F.col("c_custkey").alias("id_b"))
    return connected_components(pairs.unionByName(selfp)).select(
        F.col("id").cast("long").alias("id"),
        F.col("component").cast("long").alias("component"))


@q("dedup_fuzzy_ed1_planted", """
WITH n AS (SELECT c_custkey, c_name FROM customer
           WHERE c_custkey % 100000000 < 600)
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       a.c_name AS text_a, b.c_name AS text_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM n a JOIN n b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1""")
def dedup_fuzzy_ed1_planted(spark, sf_dir):
    """BOUNDED companion to ``dedup_fuzzy_ed1_pairs`` (r10 verdict
    task 5): the organic full-corpus entry's oracle is an O(n²)
    levenshtein self-join that is infeasible at sf1 (2.25 B
    comparisons — standing audit exclusion), so this companion runs
    the IDENTICAL engine path (llm/dedup.py fuzzy_pairs_ed1 —
    SymSpell deletion-variant blocking + exact verify) on a subset
    bounded PER STRIDE COPY (``c_custkey % 1e8 < 600`` — make_sf.py
    offsets keys by 1e8 per copy), keeping the oracle's brute force
    ≤ 18 M comparisons at sf1.  The fixture is naturally planted:
    copies share names (ed-0 twins) and digit-neighbour names sit at
    exactly ed 1, so blocking, hash-collision verify, and the a<b
    canonicalization are all exercised with a non-trivial pair set at
    every scale."""
    from aws_etl_bank_spark.llm.dedup import fuzzy_pairs_ed1

    c = (load_table(spark, sf_dir, "customer")
         .where(F.col("c_custkey") % 100_000_000 < 600))
    return fuzzy_pairs_ed1(c, "c_name", "c_custkey").select(
        "id_a", "id_b", "text_a", "text_b",
        F.col("dist").cast("int").alias("dist"))


@q("dedup_fuzzy_entity_planted", """
WITH RECURSIVE nodes AS (
  SELECT c_custkey AS id, c_name AS name FROM customer
  WHERE c_custkey % 100000000 < 200
),
edges AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM nodes a JOIN nodes b ON levenshtein(a.name, b.name) <= 1
),
reach AS (
  SELECT id, id AS lbl FROM nodes
  UNION
  SELECT e.id_b, r.lbl FROM reach r JOIN edges e ON e.id_a = r.id
)
SELECT CAST(id AS BIGINT) AS id, CAST(MIN(lbl) AS BIGINT) AS component
FROM reach GROUP BY id""")
def dedup_fuzzy_entity_planted(spark, sf_dir):
    """BOUNDED companion to ``dedup_fuzzy_entity_ids`` (r10 verdict
    task 5, same rationale as dedup_fuzzy_ed1_planted): the full
    block → match → cluster entity-resolution composition —
    fuzzy_pairs_ed1 blocking plus iterative min-label connected
    components — on the per-copy-bounded subset
    (``c_custkey % 1e8 < 200``), so the oracle's recursive closure
    over the brute-force levenshtein graph stays tractable at sf1
    (~2000 nodes).  Cross-copy identical names fuse copies into one
    cluster per digit-chain, so the transitive structure is deeper
    at sf1 than at sf0.01 — exactly what a scale audit should
    exercise."""
    from aws_etl_bank_spark.llm.dedup import (connected_components,
                                              fuzzy_pairs_ed1)

    c = (load_table(spark, sf_dir, "customer")
         .where(F.col("c_custkey") % 100_000_000 < 200))
    pairs = fuzzy_pairs_ed1(c, "c_name", "c_custkey").select("id_a", "id_b")
    selfp = c.select(F.col("c_custkey").alias("id_a"),
                     F.col("c_custkey").alias("id_b"))
    return connected_components(pairs.unionByName(selfp)).select(
        F.col("id").cast("long").alias("id"),
        F.col("component").cast("long").alias("component"))


@q("graph_pagerank", """
WITH e AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey + 1000000 AS s
           FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
ed AS (SELECT c AS src, s AS dst FROM e UNION ALL SELECT s AS src, c AS dst FROM e),
deg AS (SELECT src, COUNT(*) AS d FROM ed GROUP BY src),
nn AS (SELECT COUNT(*) AS cnt FROM deg),
p0 AS (SELECT src AS id, 1.0 / (SELECT cnt FROM nn) AS pr FROM deg),
p1 AS (SELECT ed.dst AS id,
              0.15 / (SELECT cnt FROM nn) + 0.85 * SUM(p0.pr / deg.d) AS pr
       FROM ed JOIN p0 ON p0.id = ed.src JOIN deg ON deg.src = ed.src
       GROUP BY ed.dst),
p2 AS (SELECT ed.dst AS id,
              0.15 / (SELECT cnt FROM nn) + 0.85 * SUM(p1.pr / deg.d) AS pr
       FROM ed JOIN p1 ON p1.id = ed.src JOIN deg ON deg.src = ed.src
       GROUP BY ed.dst),
p3 AS (SELECT ed.dst AS id,
              0.15 / (SELECT cnt FROM nn) + 0.85 * SUM(p2.pr / deg.d) AS pr
       FROM ed JOIN p2 ON p2.id = ed.src JOIN deg ON deg.src = ed.src
       GROUP BY ed.dst)
SELECT CAST(id AS BIGINT) AS id, ROUND(pr, 6) AS pagerank FROM p3""")
def graph_pagerank(spark, sf_dir):
    """PageRank (functions/graph.py), 3 power-method rounds at d=0.85
    over the symmetrized customer–supplier purchase graph (every node
    then has out-degree ≥ 1, so no dangling mass).  The oracle unrolls
    the identical recurrence as three chained SQL aggregations; scores
    round to 6 decimals so summation order cannot flip the compare.
    The iterative-algorithm primitive alongside connected components:
    driver-side loop control only, one edges⋈ranks shuffle per round,
    lineage truncated per round via localCheckpoint."""
    from aws_etl_bank_spark.functions.graph import pagerank

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (o.join(li, li.l_orderkey == o.o_orderkey)
             .select(F.col("o_custkey").alias("c"),
                     (F.col("l_suppkey") + 1000000).alias("s"))
             .distinct())
    edges = pairs.selectExpr("c as src", "s as dst").unionAll(
        pairs.selectExpr("s as src", "c as dst"))
    # pairs is distinct and the two union arms have disjoint src ranges,
    # so edges is distinct by construction; 1.6k nodes broadcast freely
    return pagerank(edges, assume_distinct=True, broadcast_ranks=True,
                    symmetric=True).select(
        F.col("id").cast("long").alias("id"),
        F.round("pagerank", 6).alias("pagerank"))


@q("text_unigram_logprob", """
WITH wd AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
v AS (SELECT w, COUNT(*) AS c FROM wd GROUP BY w),
t AS (SELECT SUM(c) AS tot FROM v)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       ROUND(AVG(-ln(v.c / (SELECT tot FROM t))), 6) AS avg_neg_logp
FROM wd JOIN v USING (w) GROUP BY doc_id""")
def text_unigram_logprob(spark, sf_dir):
    """Self-fitted unigram LM scoring (llm/text.py unigram_logprob):
    the corpus-frequency quality proxy used by CCNet-style filters —
    two hash-aggs plus one words⋈vocab equi-join, no Python in the
    path.  Oracle repeats the identical model in SQL."""
    from aws_etl_bank_spark.llm.text import unigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    return unigram_logprob(docs)


@q("text_hash_split", """
SELECT doc_id,
       CASE WHEN (((doc_id % 97 + 97) % 97) * 12) % 97 < 80 THEN 'train'
            WHEN (((doc_id % 97 + 97) % 97) * 12) % 97 < 90 THEN 'val'
            ELSE 'test' END AS split,
       lang
FROM documents""")
def text_hash_split(spark, sf_dir):
    """Deterministic train/val/test split (llm/text.py hash_split):
    membership is a pure function of doc_id — stable across reruns,
    partitionings and engines (the oracle recomputes the identical
    multiplicative-hash buckets).  Map-only, zero shuffles."""
    from aws_etl_bank_spark.llm.text import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return hash_split(docs, "doc_id").select("doc_id", "split", "lang")


@q("dedup_minhash_incremental", """
SELECT d.doc_id + 1000000 AS batch_id, c.doc_id AS corpus_id
FROM documents d JOIN documents c ON d.text = c.text
WHERE d.doc_id % 20 = 0""")
def dedup_minhash_incremental(spark, sf_dir):
    """Incremental MinHash dedup (llm/dedup.py minhash_band_index +
    minhash_incremental_matches): the corpus is indexed ONCE into
    (id, band, band_hash) rows; a new batch (exact copies of every 20th
    document under fresh ids) is hashed O(batch) and banded-joined
    against the stored index — the daily-ingest shape that never
    re-hashes history.  Projection to the identical-text matches must
    equal DuckDB's batch⋈corpus text-equality join exactly: an exact
    twin collides in EVERY band, so a missing row is a recall bug."""
    from aws_etl_bank_spark.llm.dedup import (minhash_band_index,
                                              minhash_incremental_matches)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index = minhash_band_index(docs, "text", "doc_id")
    batch = (docs.filter(F.col("doc_id") % 20 == 0)
             .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000)))
    matches = minhash_incremental_matches(batch, index)
    bt = batch.select(F.col("doc_id").alias("batch_id"),
                      F.col("text").alias("__bt"))
    ct = docs.select(F.col("doc_id").alias("corpus_id"),
                     F.col("text").alias("__ct"))
    return (matches.join(bt, "batch_id").join(ct, "corpus_id")
            .where(F.col("__bt") == F.col("__ct"))
            .select("batch_id", "corpus_id"))


@q("stream_incremental_dedup", """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 20 = 0
)
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM corpus GROUP BY text""")
def stream_incremental_dedup(spark, sf_dir):
    """Streaming ingest dedup (streaming/incremental_dedup.py): the
    PLANTED corpus (documents ∪ exact copies of every 20th doc at
    +1M ids — the copies' id range puts them in the LAST feed file, so
    every duplicate crosses a batch boundary) replayed as a 3-file
    id-ordered stream; each micro-batch dedups within itself, then
    against the kept corpus via the persisted MinHash band index
    (candidates by banding, acceptance by exact text equality),
    survivors extend corpus + index.  With an id-ordered feed the final
    kept set provably equals batch-global exact dedup with
    lowest-id-wins — the oracle, which the copies make non-trivial
    (all 25 must be rejected by the cross-batch index join)."""
    import time as _time

    from aws_etl_bank_spark.plans.registry import _scratch
    from aws_etl_bank_spark.streaming.incremental_dedup import (
        stream_dedup_against_index)

    docs = _planted_corpus(spark, sf_dir)
    feed_dir = _scratch(sf_dir, "dedup_feed_planted")
    import os as _os
    success = _os.path.join(feed_dir, "_SUCCESS")
    src = _os.path.realpath(_os.path.join(sf_dir, "documents.parquet"))
    if (not _os.path.exists(success)
            or (_os.path.exists(src)
                and _os.path.getmtime(src) > _os.path.getmtime(success))):
        docs.repartitionByRange(3, "doc_id").write.mode("overwrite").parquet(feed_dir)
        # the file source replays files in MODIFICATION-TIME order, not
        # path order — stamp the range files with increasing mtimes so
        # the feed arrives in id order (what lowest-id-wins needs)
        parts = sorted(f for f in _os.listdir(feed_dir) if f.endswith(".parquet"))
        base = _os.path.getmtime(success)
        for i, f in enumerate(parts):
            _os.utime(_os.path.join(feed_dir, f), (base + i + 1, base + i + 1))
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(feed_dir))
    tag = int(_time.time() * 1000)
    kept = stream_dedup_against_index(
        stream, _scratch(sf_dir, f"dedup_state_{tag}"),
        checkpoint=_scratch(sf_dir, f"dedup_ckpt_{tag}"))
    return kept.select(F.col("doc_id").cast("long"))


@q("infer_embed_texts", """
SELECT doc_id, CAST(64 AS INT) AS dim, CAST(1.0 AS DOUBLE) AS norm
FROM documents""")
def infer_embed_texts(spark, sf_dir):
    """Batched embedding inference plumbing (llm/inference.py
    embed_texts): the corpus through Arrow-batched mapInPandas with the
    deterministic stand-in encoder.  The oracle pins what IS provable
    end-to-end: one vector per document, the declared dimensionality,
    and unit L2 norm COMPUTED FROM the produced vectors JVM-side — so a
    broken batch boundary, dropped row, or skipped normalization fails
    the row/value compare.  Vector determinism (same text ⇒ same
    vector, any partitioning) is pinned in tests/test_llm.py."""
    from aws_etl_bank_spark.llm.inference import embed_texts

    docs = load_table(spark, sf_dir, "documents")
    emb = embed_texts(docs, dim=64, n_workers=8)
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0),
                              lambda a, x: a + x * x))
    return emb.select("doc_id", F.size("embedding").alias("dim"),
                      F.round(norm, 6).cast("double").alias("norm"))


@q("grouped_map_normalize", """
SELECT event_id, user_id,
       ROUND(CASE WHEN MAX(value) OVER w = MIN(value) OVER w THEN 0.5
                  ELSE (value - MIN(value) OVER w)
                       / (MAX(value) OVER w - MIN(value) OVER w) END,
             6) AS value_norm
FROM events
WINDOW w AS (PARTITION BY user_id)""")
def grouped_map_normalize(spark, sf_dir):
    """Grouped-map Pandas path (applyInPandas) proven against a SQL
    oracle: per-user min-max normalization computed INSIDE an Arrow
    batch per group, compared to the pure-window form DuckDB runs.
    This is the template for per-group Python that built-ins genuinely
    cannot express (model scoring, scipy fits): one shuffle on the
    group key, whole groups as pandas frames, vectorized numpy inside.
    For normalization itself the window form is the better plan — the
    entry exists to pin the Arrow path's correctness, not to recommend
    Python for this job (the docstringed rule: built-ins first)."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["value"].min(), pdf["value"].max()
        return pd.DataFrame({
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "value_norm": (0.5 if hi == lo
                           else (pdf["value"] - lo) / (hi - lo)),
        })

    # round SPARK-side, not in pandas: numpy's round is half-EVEN while
    # Spark/DuckDB ROUND is half-up, and normalized values land exactly
    # on .5 boundaries often enough to flip the compare (seen at sf1:
    # 0.2890625 → 0.289062 vs 0.289063)
    return (ev.select("event_id", "user_id", "value")
            .groupBy("user_id")
            .applyInPandas(norm, schema="event_id long, user_id long, "
                                        "value_norm double")
            .select("event_id", "user_id",
                    F.round("value_norm", 6).alias("value_norm")))


@q("llm_dsir_select", """
WITH rw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
tw AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents WHERE lang = 'zh'),
rc AS (SELECT w, count(*) AS cr FROM rw GROUP BY w),
tc AS (SELECT w, count(*) AS ct FROM tw GROUP BY w),
vocab AS (SELECT coalesce(rc.w, tc.w) AS w, coalesce(cr, 0) AS cr,
                 coalesce(ct, 0) AS ct
          FROM rc FULL OUTER JOIN tc ON rc.w = tc.w),
tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt, count(*) AS v FROM vocab),
lr AS (SELECT w, ln((ct + 1.0) / (nt + 1.0 * v))
              - ln((cr + 1.0) / (nr + 1.0 * v)) AS lr
       FROM vocab, tot),
dw AS (SELECT doc_id, round(sum(lr), 4) + 0 AS log_weight,
              count(*) AS n_words
       FROM rw JOIN lr USING (w) GROUP BY doc_id)
SELECT doc_id, log_weight, n_words,
       round(log_weight - ln(-ln(
           ((((doc_id % 1000003 + 1000003) % 1000003) * 427799) % 1000003
            + 0.5) / 1000003.0)), 4) + 0 AS score
FROM dw ORDER BY score DESC, doc_id LIMIT 50""")
def llm_dsir_select(spark, sf_dir):
    """DSIR data selection (llm/text.py dsir_select): pick the 50 raw
    docs whose word distribution best matches a zh-language target
    corpus, by Gumbel-top-k over smoothed unigram log-likelihood
    ratios.  The Gumbel noise is a deterministic Knuth-hash function of
    doc_id, so the DuckDB oracle reproduces the SELECTION, not just the
    weights — an engine that mis-smooths, drops vocab on the outer
    join, or perturbs nondeterministically fails the hash compare."""
    from aws_etl_bank_spark.llm import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    return dsir_select(docs, docs.filter(F.col("lang") == "zh"),
                       "text", "doc_id", k=50)


@q("dedup_substring_spans", r"""
WITH w AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS words FROM documents
),
ps AS (
  SELECT doc_id, unnest(range(1, len(words) - 6)) AS pos, words
  FROM w WHERE len(words) >= 8
),
pos_sh AS (
  SELECT doc_id, CAST(pos AS INT) AS pos,
         array_to_string(words[CAST(pos AS INT):CAST(pos + 7 AS INT)], ' ') AS s
  FROM ps
),
ok AS (SELECT s FROM pos_sh GROUP BY s HAVING count(*) <= 64),
m AS (
  SELECT a.doc_id AS id_a, a.pos AS pos_a, b.doc_id AS id_b, b.pos AS pos_b
  FROM pos_sh a JOIN ok USING (s) JOIN pos_sh b USING (s)
  WHERE a.doc_id < b.doc_id
),
isl AS (
  SELECT id_a, id_b, pos_a, pos_b,
         pos_a - row_number() OVER (
             PARTITION BY id_a, id_b, pos_a - pos_b ORDER BY pos_a) AS grp
  FROM m
)
SELECT id_a, id_b,
       CAST(min(pos_a) AS INT) AS start_a,
       CAST(min(pos_b) AS INT) AS start_b,
       CAST(max(pos_a) - min(pos_a) + 8 AS INT) AS span_tokens
FROM isl GROUP BY id_a, id_b, pos_a - pos_b, grp""")
def dedup_substring_spans(spark, sf_dir):
    """Substring-level dedup (llm/dedup.py substring_span_pairs): every
    maximal duplicated run of >= 8 word tokens across document pairs —
    the Lee et al. 2022 passage-dedup that doc-level MinHash misses.
    Engine joins positioned shingles on their 64-bit hash (the shuffle
    never carries text); the oracle joins on the shingle TEXT, so a
    hash collision or any positioning/merge bug fails the compare."""
    from aws_etl_bank_spark.llm import substring_span_pairs

    docs = load_table(spark, sf_dir, "documents")
    return substring_span_pairs(docs, "text", "doc_id", k=8,
                                max_shingle_occurrences=64)


@q("text_bigram_logprob", """
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
bg AS (
  SELECT doc_id, l[CAST(i AS INT)] AS w1, l[CAST(i + 1 AS INT)] AS w2
  FROM (SELECT doc_id, unnest(range(1, len(l))) AS i, l
        FROM tk WHERE len(l) >= 2)
),
bi AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
pfx AS (SELECT w1, sum(cb) AS cp FROM bi GROUP BY w1),
wd AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
uni AS (SELECT w, count(*) AS cu FROM wd GROUP BY w),
t AS (SELECT sum(cu) AS tot FROM uni)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       -- (1 - 0.7) not literal 0.3: the engine computes 1.0-lam in IEEE
       -- doubles (0.30000000000000004); a 0.3 literal differs in the
       -- last ulp — invisible at ROUND(,6) but a needless hazard for
       -- the sf1 decade audit's tighter magnitudes
       ROUND(AVG(-ln(0.7 * (bi.cb / CAST(pfx.cp AS DOUBLE))
                     + (1 - 0.7) * (uni.cu / CAST((SELECT tot FROM t) AS DOUBLE)))),
             6) AS avg_neg_logp
FROM bg JOIN bi USING (w1, w2) JOIN pfx USING (w1)
        JOIN uni ON uni.w = bg.w2
GROUP BY doc_id""")
def text_bigram_logprob(spark, sf_dir):
    """Interpolated bigram LM scoring (llm/text.py bigram_logprob):
    the KenLM-style perplexity quality proxy one order above
    text_unigram_logprob — p(w2|w1) = 0.7·c(w1w2)/c_prefix(w1) +
    0.3·c(w2)/total, self-fitted on the corpus.  Bigrams are built
    map-only from the token array (no window, no self-join); the
    oracle repeats the identical model in SQL, so smoothing weights,
    prefix normalization, and the natural-log base are all pinned."""
    from aws_etl_bank_spark.llm.text import bigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    return bigram_logprob(docs, lam=0.7)


@q("text_tfidf_topterms", r"""
WITH wd AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
            FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM wd GROUP BY 1, 2),
dfq AS (SELECT term, COUNT(*) AS dfn FROM tf GROUP BY 1),
nn AS (SELECT COUNT(*) AS n FROM documents),
s AS (SELECT doc_id, term, tf,
             tf * (ln((n + 1.0) / (dfn + 1.0)) + 1.0) AS score
      FROM tf JOIN dfq USING (term) CROSS JOIN nn),
r AS (SELECT doc_id, term, tf, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rnk
      FROM s)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, ROUND(score, 6) AS score,
       CAST(rnk AS INT) AS rnk
FROM r WHERE rnk <= 3""")
def text_tfidf_topterms(spark, sf_dir):
    """Per-document top-3 TF-IDF terms (llm/text.py tfidf_top_terms):
    smoothed sklearn-style idf, deterministic (score desc, term asc)
    cut.  Three bounded hash-aggs — per-(doc,term) tf, per-term df OVER
    THE TF ROWS, one-row broadcast doc count — and a per-doc window;
    no global sort, no UDF.  The oracle replays the identical model."""
    from aws_etl_bank_spark.llm.text import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, top_n=3)


@q("text_vocab_coverage", r"""
WITH wd AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS term
            FROM documents),
v AS (SELECT term, COUNT(*) AS cnt FROM wd GROUP BY 1),
t AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM v),
top AS (SELECT term, cnt FROM v ORDER BY cnt DESC, term LIMIT 50),
r AS (SELECT term, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, term) AS INT) AS rnk,
             SUM(cnt) OVER (ORDER BY cnt DESC, term
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
      FROM top)
SELECT rnk, term, CAST(cnt AS BIGINT) AS cnt,
       ROUND(CAST(cum AS DOUBLE) / tot, 6) AS cum_frac
FROM r CROSS JOIN t""")
def text_vocab_coverage(spark, sf_dir):
    """Zipf head of the corpus vocabulary (llm/text.py vocab_coverage):
    top-50 tokens with rank and CUMULATIVE share of all token
    occurrences — the curve a vocab/tokenizer builder reads.  One
    map-side-combined hash-agg (bounded by distinct terms) + TakeOrdered
    top-k + a k-row cumulative window; the total crosses as a one-row
    broadcast."""
    from aws_etl_bank_spark.llm.text import vocab_coverage

    docs = load_table(spark, sf_dir, "documents")
    out = vocab_coverage(docs, top_k=50)
    return out.withColumnRenamed("rank", "rnk")


@q("embed_quantize_int8", """
WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
m AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
c AS (SELECT vec_id, v, mx,
        CASE WHEN mx = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
             ELSE list_transform(v, x -> CAST(least(greatest(
                    floor(x * 127.0 / mx + 0.5), -127), 127) AS BIGINT))
        END AS codes,
        CASE WHEN mx = 0 THEN 0.0
             ELSE list_max(list_transform(v, x -> abs(x - least(greatest(
                    floor(x * 127.0 / mx + 0.5), -127), 127) * mx / 127.0)))
        END AS max_err
      FROM m)
SELECT vec_id, CAST(len(v) AS INT) AS n_dim, ROUND(mx, 6) AS scale,
       array_to_string(codes, ',') AS codes_csv, ROUND(max_err, 6) AS max_err
FROM c""")
def embed_quantize_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization of the embedding table
    (llm/similarity.py quantize_int8): 4× smaller vectors for the ANN
    index, with the per-vector max reconstruction error emitted beside
    the codes.  floor(+0.5) rounding — not an engine round() — because
    half-tie conventions differ between engines while floor is exact
    IEEE everywhere; that is what lets the oracle pin every code and
    every error to the digit.  Map-only built-in array expressions:
    zero shuffles, no UDF, scales embarrassingly.  The half-step error
    bound (max_err <= scale/254 + ulp) is pinned in tests."""
    from aws_etl_bank_spark.llm.similarity import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings")
    out = quantize_int8(emb, "embedding", "vec_id")
    return out.select(
        "vec_id", "n_dim", "scale",
        F.concat_ws(",", F.col("codes")).alias("codes_csv"), "max_err")


@q("dedup_ngram_containment", r"""
WITH w AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS words FROM documents
),
sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(words) >= 3 THEN
      list_distinct([array_to_string(words[CAST(i AS INT):CAST(i + 2 AS INT)], ' ')
                     for i in range(1, len(words) - 1)])
    ELSE [array_to_string(words, ' ')] END) AS s
  FROM w
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
directed AS (
  SELECT id_a AS src, id_b AS dst, n_common FROM common
  UNION ALL
  SELECT id_b AS src, id_a AS dst, n_common FROM common)
SELECT src, dst, CAST(n_common AS BIGINT) AS n_common,
       ROUND(n_common / CAST(sz AS DOUBLE) + 0.000000001, 4) AS containment
FROM directed JOIN sizes ON sizes.doc_id = directed.src
WHERE n_common / CAST(sz AS DOUBLE) >= 0.8""")
def dedup_ngram_containment(spark, sf_dir):
    """DIRECTIONAL n-gram containment dedup (llm/dedup.py
    ngram_containment_pairs): |sh(src) ∩ sh(dst)| / |sh(src)| ≥ 0.8 —
    Broder's asymmetric resemblance, catching the short-doc-pasted-in-
    long-doc subset duplication that Jaccard's union denominator hides.
    Same one-parse postings plan as dedup_ngram_jaccard (sorted posting
    list per shingle, two-level explode, hub-df cut); each unordered
    pair emits up to two directional rows at zero extra join cost."""
    from aws_etl_bank_spark.llm.dedup import ngram_containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return ngram_containment_pairs(docs, "text", "doc_id",
                                   shingle_n=3, threshold=0.8)


@q("mix_temperature_weights", """
WITH per AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n
             FROM documents GROUP BY lang),
t AS (SELECT SUM(n) AS tot FROM per),
p AS (SELECT lang, n, n / tot AS p FROM per CROSS JOIN t),
z AS (SELECT SUM(pow(p, 0.7)) AS z FROM p)
SELECT lang, CAST(n AS BIGINT) AS n, ROUND(p, 6) AS p,
       ROUND(pow(p, 0.7) / z, 6) AS w,
       ROUND(pow(p, 0.7) / z / p, 4) AS upsample
FROM p CROSS JOIN z""")
def mix_temperature_weights(spark, sf_dir):
    """Temperature-scaled language-mixing weights (llm/text.py
    temperature_mix_weights, α=0.7 — the XLM/mT5 convention): p^α
    renormalized upsamples tail languages relative to raw proportions;
    the ``upsample`` column is the effective per-language multiplier a
    sampler applies.  Two bounded aggs + two one-row broadcasts —
    nothing scales with the corpus.  The deterministic-weights
    complement of the stochastic token_budget_mix/upsample entries."""
    from aws_etl_bank_spark.llm.text import temperature_mix_weights

    docs = load_table(spark, sf_dir, "documents")
    return temperature_mix_weights(docs, "lang", alpha=0.7)


@q("embed_dim_variance", """
WITH xs AS (
  SELECT i.i AS dim, CAST(embedding[CAST(i.i + 1 AS INT)] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(0, 64) i(i)),
st AS (
  SELECT dim, COUNT(*) AS n, SUM(x) AS s, SUM(x * x) AS s2
  FROM xs GROUP BY dim)
SELECT CAST(dim AS INT) AS dim, CAST(n AS BIGINT) AS n,
       ROUND((s2 - s * s / n) / (n - 1), 6) AS var
FROM st ORDER BY (s2 - s * s / n) / (n - 1) DESC, dim LIMIT 8""")
def embed_dim_variance(spark, sf_dir):
    """Variance-based embedding-dimension selection (llm/similarity.py
    dim_variance_select): the top-8 highest-variance of the 64
    dimensions — the cheapest honest dimensionality reduction (drop
    near-constant dims before they waste ANN index space).  Variance
    uses explicit sufficient statistics (Σx, Σx², n) rather than an
    engine var_samp whose streaming update algorithms differ across
    engines; posexplode → ONE map-side-combined hash-agg to 64 rows →
    TakeOrdered."""
    from aws_etl_bank_spark.llm.similarity import dim_variance_select

    emb = load_table(spark, sf_dir, "embeddings")
    return dim_variance_select(emb, dim=64, top_n=8)


@q("ann_lsh_planted_twin", """
SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
       CAST(1 AS BIGINT) AS rank, CAST(1.0 AS DOUBLE) AS cosine
FROM embeddings WHERE vec_id < 5""")
def ann_lsh_planted_twin(spark, sf_dir):
    """Oracle-checked projection of random-hyperplane LSH ANN
    (llm/similarity.py lsh_cosine_topk) — the third ANN family beside
    IVF (ann_ivf_planted_twin) and PQ (ann_pq_planted_twin), needing no
    training pass: ±1 hyperplanes from the bounded Knuth hash are
    compiled in as literal arrays (the PQ-codebook pattern), sign-bit
    buckets shuffle only (id, band, bucket) rows, candidates rerank by
    exact cosine.  An exact twin of each query shares EVERY band bucket
    by construction and no organic pair in this embedding set exceeds
    cosine ~0.51, so top-1 must be the twin at cosine 1.0 — the recall
    property a rows-only entry cannot prove to the driver."""
    from aws_etl_bank_spark.llm.similarity import lsh_cosine_topk

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5)
    twins = queries.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    corpus = emb.unionByName(twins)
    return lsh_cosine_topk(corpus, queries, k=1, dim=64,
                           n_planes=16, bands=2)


@q("text_decontaminate_bloom", r"""
WITH w AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS words FROM documents
),
s AS (
  SELECT doc_id, unnest(
    CASE WHEN len(words) >= 3 THEN
      list_distinct([array_to_string(words[CAST(i AS INT):CAST(i + 2 AS INT)], ' ')
                     for i in range(1, len(words) - 1)])
    ELSE [array_to_string(words, ' ')] END) AS sh
  FROM w
),
bench AS (SELECT DISTINCT sh FROM s WHERE doc_id % 97 = 0),
sizes AS (SELECT doc_id, count(*) AS sz FROM s GROUP BY doc_id),
m AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_matched
      FROM s JOIN bench USING (sh) GROUP BY s.doc_id)
SELECT d.doc_id,
       COALESCE(n_matched, 0) AS n_matched_ngrams,
       COALESCE(round(n_matched / CAST(sz AS DOUBLE) + 0.000000001, 4), 0.0) AS matched_frac,
       COALESCE(round(n_matched / CAST(sz AS DOUBLE) + 0.000000001, 4), 0.0) >= 0.5 AS contaminated
FROM documents d
JOIN sizes USING (doc_id)
LEFT JOIN m USING (doc_id)""")
def text_decontaminate_bloom(spark, sf_dir):
    """Bloom-prefiltered decontamination (llm/dedup.py
    decontaminate_bloom): the corpus's shingles are screened against a
    ≤32 KiB Bloom bitmap of the benchmark's shingles BEFORE the exact
    join — the shape for a benchmark too big to broadcast as rows
    (its bitmap never is).  No false negatives, and the exact join
    removes false positives, so the output — and therefore the oracle —
    is byte-identical to the unfiltered text_decontaminate: what this
    entry proves is that the prefilter changes the plan, not the
    answer (the string sibling of join_bloom_prefilter)."""
    from aws_etl_bank_spark.llm.dedup import decontaminate_bloom

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return decontaminate_bloom(docs, bench, shingle_n=3,
                               frac_threshold=0.5).select(
        "doc_id", "n_matched_ngrams", "matched_frac", "contaminated")


@q("stream_quantile_sketch", """
WITH h AS (
  SELECT CAST(least(greatest(floor((value - 0.0) / 2.0), 0), 249) AS BIGINT) AS bin,
         COUNT(*) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1),
c AS (
  SELECT bin, cnt,
         SUM(cnt) OVER (ORDER BY bin) AS cum,
         SUM(cnt) OVER (ORDER BY bin) - cnt AS cum_before,
         SUM(cnt) OVER () AS n
  FROM h),
qs AS (SELECT CAST(unnest([0.1, 0.5, 0.9, 0.99]) AS DOUBLE) AS q),
probe AS (
  SELECT q, CAST(floor(q * (n - 1)) AS BIGINT) + 1 AS r,
         bin, cnt, cum, cum_before
  FROM qs CROSS JOIN c)
SELECT q, r, bin,
       ROUND(0.0 + 2.0 * (bin + (r - cum_before) / CAST(cnt AS DOUBLE)), 6) AS est
FROM probe WHERE cum >= r AND cum_before < r""")
def stream_quantile_sketch(spark, sf_dir):
    """Streaming quantile rollup via the MERGEABLE binned sketch
    (functions/scale.py): each micro-batch of the event stream builds
    its own ≤250-row histogram; cross-batch state is the SUM of bins —
    never the raw values — and the final estimates are read off the
    merged sketch.  Because merge-equals-direct is exact (pinned in
    tests/test_scale.py), the streamed result equals the batch
    computation to the digit, which is what the shared oracle with
    sketch_quantile_binned checks.  THE mergeable-sketch streaming
    story: per-day/per-batch sketches roll up without re-touching
    history (an exact percentile would re-sort everything per batch)."""
    import time as _time

    import pyspark.sql.types as T

    from aws_etl_bank_spark.functions.scale import (quantile_estimate,
                                                    quantile_merge)
    from aws_etl_bank_spark.functions.scale import quantile_sketch as qsk
    from aws_etl_bank_spark.plans.registry import _scratch
    from aws_etl_bank_spark.streaming import for_each_batch

    stream = events_stream(spark, _events_stream_dir(sf_dir))
    collected: list = []

    def handle(batch_df, batch_id):
        rows = qsk(batch_df, "value", 0.0, 500.0, n_bins=250).collect()
        collected.extend([(r["bin"], r["cnt"]) for r in rows])

    for_each_batch(stream, handle, {
        "windowSize": "1 seconds",
        "checkpointLocation": _scratch(
            sf_dir, f"qsk_ckpt_{int(_time.time() * 1000)}"),
        "availableNow": True,
    })
    schema = T.StructType([T.StructField("bin", T.LongType()),
                           T.StructField("cnt", T.LongType())])
    merged = quantile_merge(spark.createDataFrame(collected, schema))
    return quantile_estimate(merged, [0.1, 0.5, 0.9, 0.99],
                             0.0, 500.0, n_bins=250)


@q("graph_degree_distribution", """
WITH pairs AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey + 1000000 AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
deg AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT c AS node FROM pairs UNION ALL SELECT s AS node FROM pairs)
  GROUP BY node)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree""")
def graph_degree_distribution(spark, sf_dir):
    """Degree histogram of the customer–supplier purchase graph (the
    same distinct-edge construction as graph_pagerank): two hash-aggs —
    per-node degree (map-side combined), then nodes per degree — the
    first thing to read before ANY graph algorithm at 100 TB, because
    the max-degree tail IS the skew/hub forecast for CC's and
    PageRank's joins (and for every posting-list dedup op: same hub
    hazard, same cut decision)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (o.join(li, li.l_orderkey == o.o_orderkey)
             .select(F.col("o_custkey").alias("c"),
                     (F.col("l_suppkey") + 1_000_000).alias("s"))
             .distinct())
    nodes = (pairs.select(F.col("c").alias("node"))
             .unionAll(pairs.select(F.col("s").alias("node"))))
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return (deg.groupBy("degree")
            .agg(F.count(F.lit(1)).alias("n_nodes"))
            .select(F.col("degree").cast("long"),
                    F.col("n_nodes").cast("long")))


@q("sample_bottomk_hash", """
WITH h AS (
  SELECT doc_id, lang,
         (((doc_id % 1000003 + 1000003) % 1000003) * 2654435761) % 1000003 AS hk
  FROM documents)
SELECT doc_id, lang FROM h ORDER BY hk, doc_id LIMIT 200""")
def sample_bottomk_hash(spark, sf_dir):
    """Deterministic uniform-without-replacement k-sample via bottom-k
    of the Knuth multiplicative hash (the llm/text.py hash_split
    family): "give me 200 representative docs" as a TakeOrdered over
    the hash — no global sort, no RNG state, reproducible across
    engines/retries/partitionings, and STABLE under corpus growth (a
    doc's hash never changes, so samples only churn at the k-th-hash
    boundary — the property a debugging/eval sample wants, which
    rand()-based sampling lacks).  The bounded-intermediate form
    (pmod before multiply) never overflows int64."""
    docs = load_table(spark, sf_dir, "documents")
    hk = F.pmod(F.pmod(F.col("doc_id").cast("long"), F.lit(1000003))
                * F.lit(2654435761 % 1000003), F.lit(1000003))
    return (docs.select("doc_id", "lang", hk.alias("__hk"))
            .orderBy("__hk", "doc_id").limit(200)
            .select("doc_id", "lang"))


@q("graph_triangle_count", """
WITH ks AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
            WHERE c_custkey % 7 <> 0),
band AS (
  SELECT x.k AS a, y.k AS b FROM ks x JOIN ks y ON y.k = x.k + 1
  UNION ALL
  SELECT x.k AS a, y.k AS b FROM ks x JOIN ks y ON y.k = x.k + 2),
hub AS (SELECT CAST(0 AS BIGINT) AS a, k AS b FROM ks WHERE k % 3 <= 1),
e AS (SELECT a, b FROM band UNION ALL SELECT a, b FROM hub),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM
     (SELECT DISTINCT n FROM
        (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e))) AS n_nodes,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles""")
def graph_triangle_count(spark, sf_dir):
    """Exact triangle counting by degree orientation
    (functions/graph.py:triangle_count) over a deterministic fixture
    with a PLANTED HUB: a banded graph on customer keys (edges k—k+1,
    k—k+2 over keys with k%7≠0, giving closed band triangles) plus a
    hub node 0 adjacent to two-thirds of all nodes.  The hub is the
    point: naive wedge enumeration would generate deg(hub)² ≈ (2N/3)²
    wedges — the quadratic blowup that kills co-occurrence joins at
    100 TB — while degree orientation points every hub edge INTO the
    hub so it generates zero wedges and its triangles are found from
    their low-degree corners (Σ outdeg² ≤ O(m^1.5) on ANY graph).  The
    oracle counts the same triangles by a canonical x<y<z three-way
    self-join, orientation-free — so the check is of the counting
    semantics, not a replay of the plan."""
    from aws_etl_bank_spark.functions.graph import triangle_count

    ks = (load_table(spark, sf_dir, "customer")
          .select(F.col("c_custkey").cast("long").alias("k"))
          .filter(F.col("k") % 7 != 0))
    b1 = (ks.alias("x").join(ks.alias("y"),
                             F.col("y.k") == F.col("x.k") + 1)
          .select(F.col("x.k").alias("a"), F.col("y.k").alias("b")))
    b2 = (ks.alias("x").join(ks.alias("y"),
                             F.col("y.k") == F.col("x.k") + 2)
          .select(F.col("x.k").alias("a"), F.col("y.k").alias("b")))
    hub = (ks.filter(F.col("k") % 3 <= 1)
           .select(F.lit(0).cast("long").alias("a"), F.col("k").alias("b")))
    return triangle_count(b1.unionAll(b2).unionAll(hub))


@q("sample_weighted_priority", """
WITH h AS (
  SELECT o_orderkey, o_totalprice,
         (((o_orderkey % 1000003 + 1000003) % 1000003) * 2654435761)
           % 1000003 + 1 AS hk,
         GREATEST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT), 1) AS w
  FROM orders)
SELECT o_orderkey, o_totalprice
FROM h
ORDER BY CAST(hk AS DOUBLE) / CAST(w AS DOUBLE), o_orderkey
LIMIT 100""")
def sample_weighted_priority(spark, sf_dir):
    """Deterministic weighted priority sample, k=100 orders with
    inclusion biased toward high ``o_totalprice``: priority =
    hash(key)/weight, keep the bottom-k (the exponential-clocks /
    PPSWOR shape of Efraimidis–Espirakis sampling with the uniform
    draw replaced by the corpus-stable Knuth hash of
    sample_bottomk_hash).  Same scale posture as bottom-k: a
    TakeOrdered, never a global sort; reproducible across engines,
    retries and repartitionings; stable under corpus growth.
    Cross-engine exactness by construction: hash and weight are pure
    int64 arithmetic (floor(x·100+0.5) cents, never engine round()
    half-ties) and the only float op is ONE IEEE-exact division —
    no libm (ln/pow) in the ranking key, so both engines compute
    bit-identical priorities."""
    o = load_table(spark, sf_dir, "orders")
    hk = (F.pmod(F.pmod(F.col("o_orderkey").cast("long"), F.lit(1000003))
                 * F.lit(2654435761 % 1000003), F.lit(1000003)) + 1)
    w = F.greatest(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"),
                   F.lit(1))
    pr = hk.cast("double") / w.cast("double")
    return (o.select("o_orderkey", "o_totalprice", pr.alias("__pr"))
            .orderBy("__pr", "o_orderkey").limit(100)
            .select("o_orderkey", "o_totalprice"))


def _feature_hash_oracle(n: int = 16) -> str:
    cols = ",\n  ".join(
        f"CAST(SUM(CASE WHEN b = {i} THEN 1 ELSE 0 END) AS BIGINT) AS f{i}"
        for i in range(n))
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '\\s+')) AS tok
  FROM documents),
tb AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) % {n} AS b
  FROM tok WHERE tok <> '')
SELECT doc_id,
  {cols}
FROM tb GROUP BY doc_id"""


@q("feature_hash_text", _feature_hash_oracle())
def feature_hash_text(spark, sf_dir):
    """Hashing-trick bag-of-words featurization over the corpus
    (llm/text.py:feature_hash) — 16 hashed count features per doc,
    no global vocabulary (see the function docstring for why that is
    the 100 TB-shaped choice).  Cross-engine check: the md5-top-60-bit
    bucket is bit-identical in Spark (conv(substring(md5,1,15),16,10))
    and DuckDB (CAST('0x'||substr(md5,1,15) AS BIGINT)), proven here
    over every token of every document."""
    from aws_etl_bank_spark.llm.text import feature_hash

    docs = load_table(spark, sf_dir, "documents")
    return feature_hash(docs, "text", "doc_id", n_features=16)


@q("scale_heavy_hitters", """
WITH kk AS (
  SELECT CASE WHEN o_orderkey % 3 = 0 THEN o_custkey % 10
              ELSE o_custkey + 1000000 END AS key
  FROM orders)
SELECT key, CAST(COUNT(*) AS BIGINT) AS cnt
FROM kk GROUP BY key ORDER BY cnt DESC, key LIMIT 10""")
def scale_heavy_hitters(spark, sf_dir):
    """Exact top-10 heavy hitters via per-partition Misra–Gries
    candidate pruning (functions/scale.py:heavy_hitters_topk) on a
    PLANTED power-law key: a third of all orders collapse onto 10 hub
    keys (each ≈ N/30 ≫ the N/128 MG guarantee threshold), the rest
    stay near-unique — the cardinality profile where a plain
    groupBy-then-top-k shuffles billions of singleton keys to find ten
    hubs.  The MG pass emits ≤ 128 candidates per partition, the exact
    recount groups only candidate rows, and the oracle recomputes true
    top-10 by brute force — checking both the candidate-completeness
    guarantee and the exact counts."""
    from aws_etl_bank_spark.functions.scale import heavy_hitters_topk

    o = load_table(spark, sf_dir, "orders")
    kk = o.select(
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_custkey") % 10)
        .otherwise(F.col("o_custkey") + 1_000_000).alias("key"))
    return heavy_hitters_topk(kk, "key", k=10, counters=128)


@q("embed_pca_planted_axis", """
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS n,
       CAST(64 AS BIGINT) AS dim,
       CAST(1 AS INTEGER) AS aligned,
       CAST(1 AS INTEGER) AS dominant""")
def embed_pca_planted_axis(spark, sf_dir):
    """Distributed PCA, planted-axis check (the planted-twin oracle
    convention of the ANN family): each embedding is shifted ±2 along
    the unit direction u = 1/8·(1,…,1) by vec_id parity, planting a
    variance-4 component that dwarfs the data's own spectrum; the top
    principal component recovered by llm/decompose.py:pca_top_component
    (per-partition Gram partials via one Arrow pass — executors ship
    d+d² doubles PER PARTITION, never per row — then an O(d³) driver
    eigensolve) must align with u (|cos| ≥ 0.99) and carry ≥ half the
    total variance.  The oracle pins n/dim genuinely and the two
    invariant bits by construction."""
    import numpy as np

    from aws_etl_bank_spark.llm.decompose import pca_top_component

    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.select(
        F.transform(
            "embedding",
            lambda x: x.cast("double")
            + F.when(F.col("vec_id") % 2 == 0, F.lit(0.25))
            .otherwise(F.lit(-0.25)))
        .alias("v"))
    n, eigval, v, trace = pca_top_component(planted, "v", 64)
    u = np.full(64, 0.125)
    cos = abs(float(np.dot(v, u)))
    return spark.createDataFrame(
        [(n, 64, int(cos >= 0.99), int(eigval >= 0.5 * trace))],
        "n long, dim long, aligned int, dominant int")


@q("sample_per_group_bottomk", """
WITH h AS (
  SELECT lang, doc_id,
         (((doc_id % 1000003 + 1000003) % 1000003) * 2654435761)
           % 1000003 AS hk
  FROM documents),
r AS (SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn
      FROM h)
SELECT lang, doc_id FROM r WHERE rn <= 5""")
def sample_per_group_bottomk(spark, sf_dir):
    """Deterministic per-group k-sample — "5 representative docs per
    language" — as bottom-k of the corpus-stable Knuth hash WITHIN each
    group (the per-stratum sibling of sample_bottomk_hash, same
    stability-under-growth property per group).  The rank filter is
    planted directly on the window so Catalyst's WindowGroupLimit
    pushdown keeps only k rows per group BEFORE the exchange — each map
    task forwards ≤ k·groups rows, so the shuffle is bounded by the
    sample size, not the corpus (asserted in tests/test_plans.py)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    hk = F.pmod(F.pmod(F.col("doc_id").cast("long"), F.lit(1000003))
                * F.lit(2654435761 % 1000003), F.lit(1000003))
    w = Window.partitionBy("lang").orderBy("__hk", "doc_id")
    return (docs.select("lang", "doc_id", hk.alias("__hk"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= 5)
            .select("lang", "doc_id"))


@q("multimodal_decode_wav", """
WITH w AS (
  SELECT doc_id AS d, 64 + doc_id % 97 AS n
  FROM documents WHERE doc_id < 500),
s AS (SELECT d, n, unnest(range(0, n)) AS i FROM w),
v AS (SELECT d, n, i, ((d * 17 + i * 13) % 4096) - 2048 AS x FROM s),
z AS (SELECT d,
             CASE WHEN x * lag(x) OVER (PARTITION BY d ORDER BY i) < 0
                  THEN 1 ELSE 0 END AS c
      FROM v)
SELECT v.d AS doc_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(1 AS INT) AS n_channels,
       CAST(v.n AS BIGINT) AS n_samples,
       CAST(SUM(v.x) AS DOUBLE) / v.n AS mean_amp,
       sqrt(CAST(SUM(v.x * v.x) AS DOUBLE) / v.n) AS rms,
       CAST(MAX(ABS(v.x)) AS INT) AS peak,
       (SELECT CAST(SUM(c) AS BIGINT) FROM z WHERE z.d = v.d) AS zero_cross
FROM v GROUP BY v.d, v.n""")
def multimodal_decode_wav(spark, sf_dir):
    """REAL audio decoding (llm/multimodal.py:_decode_wav — a proper
    RIFF chunk walk + 16-bit PCM frombuffer, numpy only): deterministic
    mono 8 kHz WAVs are generated per doc id (synthetic_wav_payloads —
    sample i of doc d is ((d·17 + i·13) mod 4096) − 2048), then decoded
    and featurized (count, mean, RMS, peak, zero crossings) inside one
    Arrow-batched map-only pass.  The oracle recomputes every feature
    from the same arithmetic over unnest(range(n)) — a header
    misparse, byte-order flip, off-by-one in the data chunk, or
    dropped sample shifts mean/RMS/zero-cross and fails the hash.
    mean and RMS are exact cross-engine (integer sums, IEEE division,
    IEEE sqrt — no libm, no rounding).  Compressed audio (non-PCM
    format tags) takes the same per-row NULL gate as JPEG/PNG."""
    from aws_etl_bank_spark.llm.multimodal import (decode_audio_features,
                                                   synthetic_wav_payloads)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return decode_audio_features(synthetic_wav_payloads(docs))


@q("embed_jl_projection", """
WITH v AS (
  SELECT vec_id, j.i AS j, CAST(j.x AS DOUBLE) AS x
  FROM (SELECT vec_id,
               unnest(embedding) AS x,
               unnest(range(0, 64)) AS i
        FROM embeddings) AS j(vec_id, x, i)),
proj AS (
  SELECT vec_id, d.range AS dim,
         SUM(x * (1.0 - 2.0 * ((((d.range * 64 + j) % 1000003)
                                * 427799 % 1000003) % 2))) / 4.0 AS val
  FROM v, range(16) d
  GROUP BY vec_id, d.range)
SELECT vec_id, CAST(dim AS INT) AS dim, ROUND(val, 5) + 0 AS val
FROM proj""")
def embed_jl_projection(spark, sf_dir):
    """Deterministic JL random projection 64→16
    (llm/decompose.py:jl_project — ±1 Achlioptas matrix from Knuth-hash
    parity, compiled into the plan as literals; zip_with+aggregate
    fold inside codegen, zero exchanges).  The oracle rebuilds the
    SAME matrix from the same hash arithmetic (427799 =
    2654435761 mod 1000003) and recomputes every projected coordinate;
    the only cross-engine slack is float summation order over 64
    terms, masked by the canon-zero 5-decimal round.  JL distance
    preservation is property-tested in tests/test_llm.py."""
    from aws_etl_bank_spark.llm.decompose import jl_project

    emb = load_table(spark, sf_dir, "embeddings")
    out = jl_project(emb, "embedding", "vec_id", 64, 16)
    return out.select("vec_id", "dim",
                      (F.round(F.col("val"), 5) + 0).alias("val"))


@q("dedup_substring_remove", r"""
WITH w AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS words FROM documents
),
ps AS (
  SELECT doc_id, unnest(range(1, len(words) - 6)) AS pos, words
  FROM w WHERE len(words) >= 8
),
pos_sh AS (
  SELECT doc_id, CAST(pos AS INT) AS pos,
         array_to_string(words[CAST(pos AS INT):CAST(pos + 7 AS INT)], ' ') AS s
  FROM ps
),
ok AS (SELECT s FROM pos_sh GROUP BY s HAVING count(*) <= 64),
m AS (
  SELECT a.doc_id AS id_a, a.pos AS pos_a, b.doc_id AS id_b, b.pos AS pos_b
  FROM pos_sh a JOIN ok USING (s) JOIN pos_sh b USING (s)
  WHERE a.doc_id < b.doc_id
),
isl AS (
  SELECT id_a, id_b, pos_a, pos_b,
         pos_a - row_number() OVER (
             PARTITION BY id_a, id_b, pos_a - pos_b ORDER BY pos_a) AS grp
  FROM m
),
sp AS (
  SELECT id_b AS doc_id,
         CAST(min(pos_b) AS BIGINT) AS s,
         CAST(min(pos_b) + (max(pos_a) - min(pos_a) + 8) - 1 AS BIGINT) AS e
  FROM isl GROUP BY id_a, id_b, pos_a - pos_b, grp
),
srt AS (
  SELECT doc_id, s, e,
         max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS pmax
  FROM sp
),
gi AS (
  SELECT doc_id, s, e,
         SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s, e) AS isl2
  FROM srt
),
mi AS (SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM gi GROUP BY doc_id, isl2),
tk AS (
  SELECT doc_id, unnest(words) AS tok,
         unnest(range(1, len(words) + 1)) AS pos
  FROM w
),
keep AS (
  SELECT t.doc_id,
         CASE WHEN mi.s IS NULL THEN t.tok END AS tok,
         t.pos
  FROM tk t
  LEFT JOIN mi ON mi.doc_id = t.doc_id AND t.pos BETWEEN mi.s AND mi.e
)
SELECT doc_id,
       COALESCE(string_agg(tok, ' ' ORDER BY pos), '') AS clean_text,
       CAST(SUM(CASE WHEN tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed
FROM keep GROUP BY doc_id""")
def dedup_substring_remove(spark, sf_dir):
    """The REMOVAL half of the Lee et al. passage-dedup pipeline
    (llm/dedup.py remove_duplicate_spans, fed by substring_span_pairs):
    every duplicated ≥8-token run is cut from the higher-id document
    (keep-first), overlapping cut intervals merge per doc, and the
    survivor tokens splice back map-side (array filter/gather inside
    codegen — the 22 M-token frame at sf1 never shuffles).  The oracle
    replays the ENTIRE pipeline in SQL — span mining on shingle TEXT
    (so hash collisions fail the compare), interval merge as windowed
    gaps-and-islands, token filtering via a disjoint-interval join —
    and reconstructs every document's expected cleaned text
    byte-for-byte."""
    from aws_etl_bank_spark.llm import (remove_duplicate_spans,
                                        substring_span_pairs)

    docs = load_table(spark, sf_dir, "documents")
    spans = substring_span_pairs(docs, "text", "doc_id", k=8,
                                 max_shingle_occurrences=64)
    return remove_duplicate_spans(docs, spans, "text", "doc_id", k=8)


@q("ann_ivf_index_persisted", """
SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
       CAST(1 AS BIGINT) AS rank, CAST(1.0 AS DOUBLE) AS cosine
FROM embeddings WHERE vec_id < 5""")
def ann_ivf_index_persisted(spark, sf_dir):
    """The persisted-index ANN lifecycle (llm/similarity.py
    ivf_index_write / ivf_index_topk): the planted-twin corpus is
    cell-assigned ONCE and written as parquet partitioned by cell_id,
    then queried through the stored index with an isin partition
    filter — the reader prunes every unprobed inverted list's files
    (PartitionFilters pinned in tests/test_llm.py).  Same recall
    oracle as ann_ivf_planted_twin: identical vectors co-cell, the
    twin must come back at rank 1 / cosine 1.0 — proving the
    round-trip (assignment → partitioned write → pruned read → probe
    → rank) preserves the index semantics, not just the in-memory
    plan."""
    from aws_etl_bank_spark.llm.similarity import (ivf_index_topk,
                                                   ivf_index_write)
    from aws_etl_bank_spark.plans.registry import _scratch

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5)
    twins = queries.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    corpus = emb.unionByName(twins)
    path = _scratch(sf_dir, "ivf_index")
    ivf_index_write(corpus, path, n_cells=16)
    return ivf_index_topk(spark, path, queries, k=1, nprobe=4)


@q("text_vocab_encode", """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '\\s+')) AS token,
         unnest(range(1, len(string_split_regex(lower(text), '\\s+')) + 1))
           AS pos
  FROM documents),
tk AS (SELECT doc_id, token, pos FROM tok WHERE token <> ''),
vc AS (SELECT token, COUNT(*) AS n FROM tk GROUP BY token),
v AS (SELECT token,
             CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS tid
      FROM vc ORDER BY n DESC, token LIMIT 16),
enc AS (
  SELECT tk.doc_id, tk.pos, COALESCE(v.tid, 0) AS tid
  FROM tk LEFT JOIN v USING (token))
SELECT doc_id,
       array_to_string(list(CAST(tid AS VARCHAR) ORDER BY pos), ',') AS ids,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
FROM enc GROUP BY doc_id""")
def text_vocab_encode(spark, sf_dir):
    """Vocabulary build + corpus encoding (llm/text.py build_vocab /
    encode_with_vocab) — the tokenize-for-training step: a 16-token
    frequency-ranked vocab (deterministic (count DESC, token)
    tie-break, id 0 = OOV) encodes every document to an id array in
    original token order.  The small vocab deliberately forces OOV
    traffic so the unk path is oracle-checked too.  One corpus
    hash-agg for the vocab (TakeOrdered, no global sort), one
    broadcast join + doc-keyed shuffle for the encode; the oracle
    rebuilds vocabulary, ranks and every position-ordered id array in
    SQL.  The id array is serialized with ``array_join`` (house
    convention — the driver's pandas canon cannot hash raw arrays;
    same as agg_payment_types)."""
    from aws_etl_bank_spark.llm.text import build_vocab, encode_with_vocab

    docs = load_table(spark, sf_dir, "documents")
    vocab = build_vocab(docs, "text", vocab_size=16)
    enc = encode_with_vocab(docs, vocab, "text", "doc_id")
    return enc.withColumn(
        "ids",
        F.array_join(F.transform("ids", lambda x: x.cast("string")), ","))


@q("text_word_pmi", r"""
WITH w AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
  FROM documents),
tk AS (
  SELECT doc_id,
         unnest(toks) AS wd,
         unnest(range(1, len(toks) + 1)) AS pos
  FROM w),
t AS (SELECT doc_id, wd, pos FROM tk WHERE wd <> ''),
pr AS (
  SELECT LEAST(a.wd, b.wd) AS w1, GREATEST(a.wd, b.wd) AS w2
  FROM t a JOIN t b
    ON b.doc_id = a.doc_id AND b.pos BETWEEN a.pos + 1 AND a.pos + 2),
pc AS (SELECT w1, w2, COUNT(*) AS c_ab FROM pr GROUP BY w1, w2),
uni AS (SELECT wd, COUNT(*) AS c FROM t GROUP BY wd),
tot AS (SELECT (SELECT COUNT(*) FROM pr) AS tp,
               (SELECT COUNT(*) FROM t) AS tw)
SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
       ROUND(ln((CAST(c_ab AS DOUBLE) / tp)
                / ((CAST(u1.c AS DOUBLE) / tw)
                   * (CAST(u2.c AS DOUBLE) / tw))), 6) + 0 AS pmi
FROM pc, tot
JOIN uni u1 ON u1.wd = w1
JOIN uni u2 ON u2.wd = w2
ORDER BY c_ab DESC, w1, w2
LIMIT 30""")
def text_word_pmi(spark, sf_dir):
    """Windowed word co-occurrence PMI (window ±2) — the collocation
    statistic under PPMI embedding matrices and phrase detection
    (word2vec's phrase pass), and the text sibling of
    assoc_copurchase_lift.  Pair generation is MAP-ONLY: each doc's
    token array emits its own within-window pairs via nested
    transform + one explode (the shingle pattern — never a positions
    self-join, whose shuffle would carry every token twice); then two
    hash-aggs (pair counts, unigram counts) and 1-row corpus totals
    broadcast.  PMI's log runs only on the top-k output rows, masked
    by the canon-zero round; top-30 by (support DESC, pair) is a
    TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    base = docs.select(F.col("doc_id"), toks.alias("__toks"))
    pair_expr = F.expr(
        "flatten(transform(sequence(1, greatest(size(__toks) - 1, 0)), "
        "i -> transform(sequence(i + 1, least(i + 2, size(__toks))), "
        "j -> struct(element_at(__toks, i) as x, "
        "element_at(__toks, j) as y))))")
    pr = (base.filter(F.size("__toks") >= 2)
          .select(F.explode(pair_expr).alias("p"))
          .filter((F.col("p.x") != "") & (F.col("p.y") != ""))
          .select(F.least("p.x", "p.y").alias("w1"),
                  F.greatest("p.x", "p.y").alias("w2")))
    pc = (pr.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
          .persist())
    wd = (base.select(F.explode("__toks").alias("wd"))
          .filter(F.col("wd") != ""))
    uni = wd.groupBy("wd").agg(F.count(F.lit(1)).alias("c")).persist()
    # corpus totals derive from the AGGREGATES (Σc_ab, Σc), never by
    # rescanning the corpus — pc/uni persist because each feeds both
    # its total and the final join
    tot = pc.agg(F.sum("c_ab").alias("tp")).crossJoin(
        uni.agg(F.sum("c").alias("tw")))
    u1 = uni.select(F.col("wd").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("wd").alias("w2"), F.col("c").alias("c2"))
    pmi = (F.round(F.log(
        (F.col("c_ab").cast("double") / F.col("tp"))
        / ((F.col("c1").cast("double") / F.col("tw"))
           * (F.col("c2").cast("double") / F.col("tw")))), 6) + 0)
    return (pc.join(u1, "w1").join(u2, "w2").crossJoin(F.broadcast(tot))
            .select("w1", "w2", F.col("c_ab").cast("long").alias("c_ab"),
                    pmi.alias("pmi"))
            .orderBy(F.desc("c_ab"), "w1", "w2").limit(30))


@q("multimodal_audio_spectrum", """
SELECT doc_id,
       CAST(3 + doc_id % 60 AS INT) AS peak_bin,
       CAST((3 + doc_id % 60) * 8000.0 / 256.0 AS DOUBLE) AS peak_hz,
       CAST(256 AS INT) AS n_fft
FROM documents WHERE doc_id < 400""")
def multimodal_audio_spectrum(spark, sf_dir):
    """REAL DSP on really-decoded audio (llm/multimodal.py
    audio_spectral_features): planted pure tones — doc d carries a
    sine at DFT bin 3 + d%60 — are synthesized as PCM16 WAVs, decoded
    by the RIFF parser, and rFFT'd inside one Arrow map-only pass; the
    dominant non-DC bin and its Hz must equal the closed-form planted
    values (a header misparse, sample-order flip, or off-by-one in
    the FFT window moves the peak and fails the hash).  peak_ratio is
    deliberately NOT oracle-compared: leakage magnitudes are
    FFT-implementation-specific — bin and frequency are the portable
    facts."""
    from aws_etl_bank_spark.llm.multimodal import (audio_spectral_features,
                                                   synthetic_tone_wavs)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    feats = audio_spectral_features(synthetic_tone_wavs(docs))
    return feats.select("doc_id", "peak_bin", "peak_hz", "n_fft")


@q("graph_common_neighbors", """
WITH ks AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
            WHERE c_custkey % 7 <> 0),
band AS (
  SELECT x.k AS a, y.k AS b FROM ks x JOIN ks y ON y.k = x.k + 1
  UNION ALL
  SELECT x.k AS a, y.k AS b FROM ks x JOIN ks y ON y.k = x.k + 2),
hub AS (SELECT CAST(0 AS BIGINT) AS a, k AS b FROM ks WHERE k % 3 <= 1),
e AS (SELECT a, b FROM band UNION ALL SELECT a, b FROM hub),
adj AS (SELECT a AS c, b AS n FROM e UNION ALL SELECT b AS c, a AS n FROM e),
deg AS (SELECT c, COUNT(*) AS d FROM adj GROUP BY c),
ok AS (SELECT c FROM deg WHERE d <= 32),
w AS (
  SELECT x.n AS n1, y.n AS n2
  FROM adj x JOIN ok USING (c) JOIN adj y USING (c)
  WHERE x.n < y.n),
cn AS (SELECT n1, n2, COUNT(*) AS common FROM w GROUP BY n1, n2)
SELECT n1, n2, CAST(common AS BIGINT) AS common,
       CAST(common AS DOUBLE)
         / (d1.d + d2.d - common) AS jaccard
FROM cn JOIN deg d1 ON d1.c = n1 JOIN deg d2 ON d2.c = n2
ORDER BY common DESC, n1, n2 LIMIT 50""")
def graph_common_neighbors(spark, sf_dir):
    """Common-neighbor / neighborhood-Jaccard link-prediction scores
    over the banded-plus-hub graph — the feature under friend-of-
    friend recommenders.  The scale hazard is the same one triangle
    counting dodges: wedge volume is Σ deg(center)², so the planted
    2N/3-degree hub would contribute ~(2N/3)² candidate pairs through
    ITSELF; the standing cut drops high-degree CENTERS (deg > 32)
    before the wedge join — which is also the statistically right
    call (co-adjacency through a celebrity node carries no link
    signal — the same reasoning as the posting-list df cut in the
    dedup family).  Remaining stages: adjacency hash-aggs, one
    (bounded) wedge equi-join, degree join-backs; Jaccard =
    common/(d1+d2−common) is one exact-int IEEE division; top-50 by
    (common DESC, pair) is a TakeOrdered."""
    ks = (load_table(spark, sf_dir, "customer")
          .select(F.col("c_custkey").cast("long").alias("k"))
          .filter(F.col("k") % 7 != 0))
    b1 = (ks.alias("x").join(ks.alias("y"),
                             F.col("y.k") == F.col("x.k") + 1)
          .select(F.col("x.k").alias("a"), F.col("y.k").alias("b")))
    b2 = (ks.alias("x").join(ks.alias("y"),
                             F.col("y.k") == F.col("x.k") + 2)
          .select(F.col("x.k").alias("a"), F.col("y.k").alias("b")))
    hub = (ks.filter(F.col("k") % 3 <= 1)
           .select(F.lit(0).cast("long").alias("a"), F.col("k").alias("b")))
    e = b1.unionAll(b2).unionAll(hub)
    adj = (e.select(F.col("a").alias("c"), F.col("b").alias("n"))
           .unionAll(e.select(F.col("b").alias("c"), F.col("a").alias("n"))))
    deg = adj.groupBy("c").agg(F.count(F.lit(1)).alias("d"))
    ok = deg.filter(F.col("d") <= 32).select("c")
    aok = adj.join(ok, "c")
    x, y = aok.alias("x"), aok.alias("y")
    cn = (x.join(y, (F.col("y.c") == F.col("x.c"))
                 & (F.col("x.n") < F.col("y.n")))
          .groupBy(F.col("x.n").alias("n1"), F.col("y.n").alias("n2"))
          .agg(F.count(F.lit(1)).alias("common")))
    d1 = deg.select(F.col("c").alias("n1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("c").alias("n2"), F.col("d").alias("d2"))
    return (cn.join(d1, "n1").join(d2, "n2")
            .select("n1", "n2", F.col("common").cast("long").alias("common"),
                    (F.col("common").cast("double")
                     / (F.col("d1") + F.col("d2") - F.col("common")))
                    .alias("jaccard"))
            .orderBy(F.desc("common"), "n1", "n2").limit(50))


@q("dedup_cluster_sizes", r"""
WITH RECURSIVE w AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS words
  FROM documents
),
s AS (
  SELECT doc_id, unnest(
    CASE WHEN len(words) >= 3 THEN
      list_distinct([array_to_string(words[CAST(i AS INT):CAST(i + 2 AS INT)], ' ')
                     for i in range(1, len(words) - 1)])
    ELSE [array_to_string(words, ' ')] END) AS sh
  FROM w
),
sizes AS (SELECT doc_id, count(*) AS sz FROM s GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM common
  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_common / CAST(sa.sz + sb.sz - n_common AS DOUBLE) >= 0.5
),
e AS (SELECT id_a, id_b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
      UNION SELECT doc_id, doc_id FROM w),
reach AS (
  SELECT id_a AS id, id_a AS lbl FROM e
  UNION
  SELECT e.id_b, r.lbl FROM reach r JOIN e ON e.id_a = r.id
),
comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id),
cs AS (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
FROM cs GROUP BY cluster_size""")
def dedup_cluster_sizes(spark, sf_dir):
    """Duplicate-cluster size histogram — the curation report every
    dedup run ends with ("how much of the corpus sits in dup clusters
    of size k?"), driving both the keep-policy choice and the
    dedup-rate estimate.  Composition: exact n-gram-Jaccard pairs
    (threshold 0.5, the inverted-index postings plan — never
    corpus²) → iterative connected components (singletons included
    via self-edges, so size-1 clusters appear in the histogram) → two
    hash-aggs (members per component, clusters per size).  The oracle
    recomputes the pair graph from shingle TEXT and closes it with a
    recursive min-label CTE — the same ground-truth recipe as the
    entity-resolution entry, here summarizing the whole corpus."""
    from aws_etl_bank_spark.llm import connected_components, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = (ngram_jaccard_pairs(docs, "text", "doc_id",
                                 shingle_n=3, threshold=0.5)
             .select("id_a", "id_b"))
    selfp = docs.select(F.col("doc_id").alias("id_a"),
                        F.col("doc_id").alias("id_b"))
    comp = connected_components(pairs.unionByName(selfp))
    cs = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (cs.groupBy("cluster_size")
            .agg(F.count(F.lit(1)).alias("n_clusters"))
            .select(F.col("cluster_size").cast("long"),
                    F.col("n_clusters").cast("long"),
                    (F.col("cluster_size") * F.col("n_clusters"))
                    .cast("long").alias("n_docs")))


@q("text_zipf_hapax", r"""
WITH w AS (
  SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS wd
  FROM documents),
t AS (SELECT lang, wd FROM w WHERE wd <> ''),
u AS (SELECT lang, wd, COUNT(*) AS c FROM t GROUP BY lang, wd)
SELECT lang,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS type_token_ratio,
       ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS hapax_share
FROM u GROUP BY lang""")
def text_zipf_hapax(spark, sf_dir):
    """Per-language vocabulary profile: token/type counts, hapax
    legomena, type-token ratio and hapax share — the Zipf-tail
    diagnostics a corpus curator reads before choosing vocab size and
    min-frequency cuts (a hapax share drifting up across snapshots
    usually means OCR noise or dedup regression).  Two hash-aggs —
    (lang, word) then lang — with map-side combine; the same
    ``split(lower, \\s+), drop empties`` token convention as every
    text entry.  Ratios are exact int/int divisions."""
    docs = load_table(spark, sf_dir, "documents")
    t = (docs.select("lang",
                     F.explode(F.split(F.lower("text"), r"\s+"))
                     .alias("wd"))
         .filter(F.col("wd") != ""))
    u = t.groupBy("lang", "wd").agg(F.count(F.lit(1)).alias("c"))
    return (u.groupBy("lang")
            .agg(F.sum("c").cast("long").alias("n_tokens"),
                 F.count(F.lit(1)).cast("long").alias("n_types"),
                 F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                 .cast("long").alias("n_hapax"))
            .select("lang", "n_tokens", "n_types", "n_hapax",
                    F.round(F.col("n_types").cast("double")
                            / F.col("n_tokens"), 6)
                    .alias("type_token_ratio"),
                    F.round(F.col("n_hapax").cast("double")
                            / F.col("n_types"), 6)
                    .alias("hapax_share")))


@q("text_lang_vocab_overlap", r"""
WITH w AS (
  SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS wd
  FROM documents),
v AS (SELECT DISTINCT lang, wd FROM w WHERE wd <> ''),
sz AS (SELECT lang, COUNT(*) AS n FROM v GROUP BY lang),
inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*) AS n_common
  FROM v a JOIN v b ON a.wd = b.wd AND a.lang < b.lang
  GROUP BY 1, 2)
SELECT lang_a, lang_b, CAST(n_common AS BIGINT) AS n_common,
       ROUND(CAST(n_common AS DOUBLE)
             / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.lang = lang_a
JOIN sz sb ON sb.lang = lang_b""")
def text_lang_vocab_overlap(spark, sf_dir):
    """Pairwise vocabulary Jaccard between language sub-corpora — the
    cross-lingual contamination / code-switching diagnostic (an en↔fr
    vocab overlap spiking after an ingest usually means mislabeled
    languages, not shared words).  Same postings shape as the dedup
    family: ONE distinct (lang, word) frame, word-keyed equi-join
    emits each unordered language pair once per shared word, then
    set-algebra |A∩B|/(|A|+|B|−|A∩B|) in exact int64 with one exact
    division at the end.  Language count is small but the plan never
    relies on it — the join is word-keyed, not lang²."""
    docs = load_table(spark, sf_dir, "documents")
    v = (docs.select("lang",
                     F.explode(F.split(F.lower("text"), r"\s+"))
                     .alias("wd"))
         .filter(F.col("wd") != "").distinct())
    sz = v.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    a = v.select(F.col("lang").alias("lang_a"), "wd")
    b = v.select(F.col("lang").alias("lang_b"), "wd")
    inter = (a.join(b, "wd")
             .filter(F.col("lang_a") < F.col("lang_b"))
             .groupBy("lang_a", "lang_b")
             .agg(F.count(F.lit(1)).alias("n_common")))
    sa = sz.select(F.col("lang").alias("lang_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("lang").alias("lang_b"), F.col("n").alias("nb"))
    return (inter.join(F.broadcast(sa), "lang_a")
            .join(F.broadcast(sb), "lang_b")
            .select("lang_a", "lang_b",
                    F.col("n_common").cast("long").alias("n_common"),
                    F.round(F.col("n_common").cast("double")
                            / (F.col("na") + F.col("nb")
                               - F.col("n_common")), 6).alias("jaccard")))


@q("ml_kmeans_lloyd", """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5)
                                  AS BIGINT)) AS v
  FROM embeddings),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
         list_transform(v, x -> CAST(x AS DOUBLE)) AS c
  FROM (SELECT vec_id, v FROM q ORDER BY vec_id LIMIT 4)),
d1 AS (
  SELECT q.vec_id, q.v, c0.cid,
         list_reduce(list_transform(list_zip(q.v, c0.c),
             p -> (CAST(p[1] AS DOUBLE) - p[2])
                  * (CAST(p[1] AS DOUBLE) - p[2])),
             (acc, x) -> acc + x) AS dist
  FROM q CROSS JOIN c0),
a1 AS (
  SELECT vec_id, v, cid FROM (
    SELECT vec_id, v, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cid) AS rn
    FROM d1) WHERE rn = 1),
c1 AS (
  SELECT cid, list(m ORDER BY pos) AS c FROM (
    SELECT cid, pos,
           CAST(CAST(SUM(comp) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS m
    FROM (SELECT cid, unnest(v) AS comp,
                 unnest(range(1, len(v) + 1)) AS pos
          FROM a1)
    GROUP BY cid, pos) GROUP BY cid),
d2 AS (
  SELECT q.vec_id, q.v, c1.cid,
         list_reduce(list_transform(list_zip(q.v, c1.c),
             p -> (CAST(p[1] AS DOUBLE) - p[2])
                  * (CAST(p[1] AS DOUBLE) - p[2])),
             (acc, x) -> acc + x) AS dist
  FROM q CROSS JOIN c1),
a2 AS (
  SELECT vec_id, v, cid FROM (
    SELECT vec_id, v, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cid) AS rn
    FROM d2) WHERE rn = 1),
c2 AS (
  SELECT cid, list(m ORDER BY pos) AS c FROM (
    SELECT cid, pos,
           CAST(CAST(SUM(comp) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS m
    FROM (SELECT cid, unnest(v) AS comp,
                 unnest(range(1, len(v) + 1)) AS pos
          FROM a2)
    GROUP BY cid, pos) GROUP BY cid),
d3 AS (
  SELECT q.vec_id, c2.cid,
         list_reduce(list_transform(list_zip(q.v, c2.c),
             p -> (CAST(p[1] AS DOUBLE) - p[2])
                  * (CAST(p[1] AS DOUBLE) - p[2])),
             (acc, x) -> acc + x) AS dist
  FROM q CROSS JOIN c2)
SELECT vec_id, cid FROM (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist, cid) AS rn
  FROM d3) WHERE rn = 1""")
def ml_kmeans_lloyd(spark, sf_dir):
    """Distributed k-means, ORACLE-CHECKED per assignment (llm/
    cluster.py lloyd_assign) — 2 full Lloyd steps from the 4
    smallest-id seeds, then a final assignment; every vector's cluster
    id must match DuckDB's unrolled replica of the same iterations.
    Cross-engine exactness is engineered, not hoped for: integer-
    quantized components (round-half-up canon) make cluster sums exact
    int64 hash-aggs; centroid means are one IEEE division; distance
    folds run left-to-right on both engines (F.aggregate vs
    list_reduce — IEEE 0.0+x==x aligns the seeded/unseeded folds);
    argmin ties break on cid via struct-min.  Scale shape: per
    iteration ONE broadcast-join corpus pass (assignment, no shuffle)
    + one posexplode (cid,pos) hash-agg (k*dim rows out); only k*dim
    centroid means touch the driver between iterations — the same
    bounded-collect convention the PQ codebooks use.  The ml.KMeans
    path (similarity.train_centroids) stays the production entry for
    k-means||; this one is the parity-provable Lloyd core."""
    from aws_etl_bank_spark.llm.cluster import lloyd_assign

    emb = load_table(spark, sf_dir, "embeddings")
    return lloyd_assign(emb, k=4, iters=2, scale=1000)


@q("text_bpe_train_merges", r"""
WITH wf AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
    FROM documents)
  WHERE regexp_matches(w, '^[a-z]+$')
  GROUP BY w),
s0 AS (
  SELECT array_to_string(list_transform(range(1, length(w) + 1),
           i -> w[CAST(i AS INT)]), ' ') || ' </w>' AS seg, freq
  FROM wf),
p1 AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_transform(range(1, len(string_split(seg, ' '))),
             i -> string_split(seg, ' ')[CAST(i AS INT)] || ' ' ||
                  string_split(seg, ' ')[CAST(i + 1 AS INT)])) AS pair,
           freq
    FROM s0) GROUP BY pair),
t1 AS (SELECT pair, cnt FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
s1 AS (
  SELECT trim(replace(replace(replace(' ' || seg || ' ', ' ', '  '),
              ' ' || replace(t1.pair, ' ', '  ') || ' ',
              ' ' || replace(t1.pair, ' ', '') || ' '),
              '  ', ' ')) AS seg, freq
  FROM s0, t1),
p2 AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_transform(range(1, len(string_split(seg, ' '))),
             i -> string_split(seg, ' ')[CAST(i AS INT)] || ' ' ||
                  string_split(seg, ' ')[CAST(i + 1 AS INT)])) AS pair,
           freq
    FROM s1) GROUP BY pair),
t2 AS (SELECT pair, cnt FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
s2 AS (
  SELECT trim(replace(replace(replace(' ' || seg || ' ', ' ', '  '),
              ' ' || replace(t2.pair, ' ', '  ') || ' ',
              ' ' || replace(t2.pair, ' ', '') || ' '),
              '  ', ' ')) AS seg, freq
  FROM s1, t2),
p3 AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_transform(range(1, len(string_split(seg, ' '))),
             i -> string_split(seg, ' ')[CAST(i AS INT)] || ' ' ||
                  string_split(seg, ' ')[CAST(i + 1 AS INT)])) AS pair,
           freq
    FROM s2) GROUP BY pair),
t3 AS (SELECT pair, cnt FROM p3 ORDER BY cnt DESC, pair LIMIT 1)
SELECT 1 AS rank, pair, replace(pair, ' ', '') AS merged, cnt FROM t1
UNION ALL
SELECT 2, pair, replace(pair, ' ', ''), cnt FROM t2
UNION ALL
SELECT 3, pair, replace(pair, ' ', ''), cnt FROM t3""")
def text_bpe_train_merges(spark, sf_dir):
    """BPE merge-table TRAINING (llm/text.py bpe_train_merges) — the
    Sennrich word-frequency formulation: 3 merge rounds over the
    corpus's [a-z]+ words, each round = adjacent-pair counts weighted
    by word frequency (slice+zip array ops, one vocabulary-sized
    hash-agg), top pair by (count DESC, pair ASC), one
    boundary-aware greedy replace to re-segment (separator-doubling
    so 'a a a a' merges to 'aa aa', Sennrich semantics — r10 ADVICE).
    The oracle unrolls all three rounds in SQL with the identical
    doubled-separator replace and must reproduce every learned pair
    AND its count — ties, the greedy pairwise scan ('a a a' → 'aa a'),
    and the </w> end marker all agree by construction.  Scale shape:
    corpus read ONCE to build the word-frequency table; every round
    is vocabulary-sized, and only the 1-row winner reaches the
    driver per round."""
    from aws_etl_bank_spark.llm.text import bpe_train_merges

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train_merges(docs, "text", n_merges=3)


@q("graph_cc_star_chain", """
WITH v AS (SELECT DISTINCT vec_id FROM embeddings),
r AS (SELECT vec_id,
             vec_id - row_number() OVER (ORDER BY vec_id) AS isl
      FROM v)
SELECT vec_id AS id,
       CAST(MIN(vec_id) OVER (PARTITION BY isl) AS BIGINT) AS component
FROM r""")
def graph_cc_star_chain(spark, sf_dir):
    """Connected components on a LONG-CHAIN graph via alternating
    large-star/small-star rounds (llm/dedup.py
    connected_components_star, Kiveris et al.) — the case min-label
    propagation structurally cannot handle: edges (vec_id, vec_id+1)
    form one path per contiguous id block (diameter = block size −
    hundreds at sf0.01, thousands at sf1), so min-label needs
    diameter-many join rounds while the star algorithm contracts to
    rooted stars in O(log² n) rounds regardless of diameter.  Each
    round is two groupBy-mins + joins, everything keyed on node id;
    only a 2-value convergence signature reaches the driver.  The
    oracle labels each node with its contiguous-run minimum via the
    gaps-and-islands window — the exact component structure of a
    chain-of-consecutive-integers graph.  (Chains are the worst case,
    not a corner case: dup chains, session grafts and entity-merge
    graphs all grow long paths at corpus scale.)"""
    from aws_etl_bank_spark.llm.dedup import connected_components_star

    ids = load_table(spark, sf_dir, "embeddings").select("vec_id")
    nxt = ids.select((F.col("vec_id") + 1).alias("vec_id"))
    chain = (ids.join(nxt, "vec_id")  # vec_ids that have a predecessor
             .select((F.col("vec_id") - 1).alias("id_a"),
                     F.col("vec_id").alias("id_b")))
    # self-loops register every id as a node, so an id with no
    # consecutive neighbor still surfaces as a singleton component —
    # exactly the oracle's all-nodes universe
    loops = ids.select(F.col("vec_id").alias("id_a"),
                       F.col("vec_id").alias("id_b"))
    return (connected_components_star(chain.unionByName(loops))
            .select("id", F.col("component").cast("long").alias("component")))


@q("stream_pyds_arrow_sink", """
WITH c AS (
  SELECT user_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM c GROUP BY user_id""")
def stream_pyds_arrow_sink(spark, sf_dir):
    """ARROW-native custom Python streaming sink (Spark 4.1
    ``DataSourceStreamArrowWriter``, sources/pyds_stream.py
    ArrowManifestStreamWriter): tasks receive RecordBatch iterators
    and stream them straight into staged parquet — no Python row
    objects on the hot path, unlike the row-based jsonl sibling — and
    the driver publishes the same atomic per-batch manifest only after
    every task succeeded.  Verification reads back ONLY
    manifest-listed parquet; exactly-once all-or-nothing publication
    is the hash-checked property (per-user totals over the sink equal
    the batch aggregate)."""
    import time as _time

    from aws_etl_bank_spark.plans.registry import _scratch
    from aws_etl_bank_spark.sources.pyds_stream import (
        ShardedStreamDataSource, read_manifest_sink)

    try:
        spark.dataSource.register(ShardedStreamDataSource)
    except Exception:
        pass  # already registered in this session
    stream = events_stream(spark, _events_stream_dir(sf_dir)).select(
        "event_id", "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        .alias("cents"))
    stamp = int(_time.time() * 1000)
    sink = _scratch(sf_dir, f"pyds_arrow_sink_{stamp}")
    ck = _scratch(sf_dir, f"pyds_arrow_ck_{stamp}")
    q = (stream.writeStream.format("sharded_stream")
         .option("path", sink).option("arrowSink", "true")
         .option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    back = read_manifest_sink(
        spark, sink, "event_id bigint, user_id bigint, cents bigint")
    return (back.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum("cents").alias("cents")))


@q("stream_state_store_read", """
SELECT CAST(user_id % 101 AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY 1""")
def stream_state_store_read(spark, sf_dir):
    """The STATE STORE READER data source (``spark.read.format(
    "statestore")``, Spark 4): offline introspection of a streaming
    query's checkpointed state — the ops surface for debugging state
    growth, validating a migration, or repairing a poisoned key
    without replaying the stream.  A deterministic availableNow
    aggregation (count by user_id % 101) runs to completion, then the
    entry reads its state DIRECTLY from the checkpoint; for a
    completed bounded stream that state IS the batch aggregate, which
    makes the oracle a plain GROUP BY — the reader is hash-checked,
    not just smoke-tested.  The companion ``state-metadata`` format is
    asserted inline (operator name + exactly one stateful operator).
    Value-struct field names are resolved from the read schema (the
    agg buffer column is version-internal).  At 100 TB state reads
    are per-partition parallel scans of the store files — no stream
    replay, no driver fan-in."""
    import glob as _glob
    import os
    import shutil as _shutil
    import time as _time

    from aws_etl_bank_spark.plans.registry import _scratch

    stamp = int(_time.time() * 1000)
    ck = _scratch(sf_dir, f"state_reader_ck_{stamp}")
    # ADVICE r15: the stamped checkpoint leaf made every invocation
    # leave a dir behind — unbounded .scratch growth across verify and
    # bench runs.  The leaf cannot simply be deleted in a finally block
    # (the returned DataFrame reads the store LAZILY, after this
    # function exits) nor reused as a fixed name (two verify processes
    # at the same SF would race), so each invocation instead sweeps
    # SIBLING checkpoints older than 30 minutes: growth is bounded by
    # the number of concurrent runs, and a live concurrent run's dir
    # is never touched.
    for old in _glob.glob(os.path.join(os.path.dirname(ck),
                                       "state_reader_ck_*")):
        try:
            if old != ck and os.path.getmtime(old) < _time.time() - 1800:
                _shutil.rmtree(old, ignore_errors=True)
        except OSError:
            pass  # raced with a concurrent sweep — another run owns it
    stream = events_stream(spark, _events_stream_dir(sf_dir))
    agg = (stream
           .select((F.col("user_id") % 101).cast("bigint").alias("k"))
           .groupBy("k").agg(F.count(F.lit(1)).alias("n")))
    name = f"ssr_mem_{stamp % 10_000_000}"
    query = (agg.writeStream.format("memory").queryName(name)
             .outputMode("complete")
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
    query.awaitTermination()

    meta = spark.read.format("state-metadata").load(ck)
    ops = [r.operatorName for r in meta.select("operatorName").collect()]
    # explicit raise, not assert: PYTHONOPTIMIZE strips asserts and
    # these guards are load-bearing (ADVICE r15) — exactly one
    # stateful operator must own the checkpoint
    if ops != ["stateStoreSave"]:
        raise ValueError(
            f"state-metadata lists operators {ops}; expected exactly "
            "['stateStoreSave'] — the checkpoint is not the single "
            "streaming aggregation this entry wrote")

    st = spark.read.format("statestore").load(ck)
    # exactly ONE buffer field expected (stateFormatVersion 2 stores
    # the key-free agg buffer; v1 would prepend the grouping key and
    # names[0] would silently be the wrong column — fail loud instead)
    names = st.schema["value"].dataType.names
    if len(names) != 1:
        raise ValueError(
            f"statestore value struct has fields {names}; expected a "
            "single agg-buffer field (stateFormatVersion 2) — a v1 "
            "layout would make names[0] the grouping key, silently "
            "reading the wrong column")
    value_field = names[0]
    return (st.select(
        F.col("key.k").alias("k"),
        F.col(f"value.{value_field}").cast("bigint").alias("n")))
