"""Property-based equivalence for the round-5 LLM operators.

- BM25: random small corpora + random probe queries vs a direct Python
  implementation of the Okapi/Lucene formula (the same reference the
  hand test in test_ranking.py pins on one fixture).
- Semantic dedup: with ``n_cells=1`` every row shares one cell, so
  ``semantic_dedup_pairs`` must equal the brute-force all-pairs cosine
  threshold join computed in numpy — the cell machinery can only ever
  REMOVE comparisons, and this pins the degenerate case where it may
  remove none.

Few examples (each runs Spark jobs), fully random shapes: empty
corpora, repeated tokens, duplicate vectors, all-miss queries.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from aws_etl_bank_spark.llm import ranking
from aws_etl_bank_spark.llm.dedup import semantic_dedup_pairs

_vocab = ["spark", "join", "scan", "agg", "row", "x1", "y2"]
_doc = st.lists(st.sampled_from(_vocab), min_size=0, max_size=8)
_corpus = st.lists(_doc, min_size=1, max_size=6)
_query = st.lists(st.sampled_from(_vocab), min_size=1, max_size=3, unique=True)


def _bm25_ref(docs: list[list[str]], query: list[str],
              k1: float = 1.2, b: float = 0.75):
    toks = {i: d for i, d in enumerate(docs)}
    n = len(toks)
    lens = [len(v) for v in toks.values() if len(v) > 0]
    avgdl = (sum(lens) / len(lens)) if lens else None
    dfreq = {q: sum(1 for v in toks.values() if q in v) for q in query}
    out = {}
    for i, v in toks.items():
        s, hits = 0.0, 0
        for q in query:
            tf = v.count(q)
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1.0 + (n - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if hits:
            out[i] = (round(s, 4), hits)
    return out


@settings(max_examples=12, deadline=None)
@given(docs=_corpus, query=_query)
def test_bm25_matches_python_reference(spark, docs, query):
    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["score"], r["n_terms"])
           for r in ranking.bm25_scores(df, query).collect()}
    assert got == _bm25_ref(docs, query)


_dim = 4
_vec = st.lists(st.integers(-3, 3), min_size=_dim, max_size=_dim)
_vecs = st.lists(_vec, min_size=1, max_size=8)


def _allpairs_ref(vecs: list[list[int]], threshold: float):
    out = set()
    for i, a in enumerate(vecs):
        for j in range(i + 1, len(vecs)):
            bvec = vecs[j]
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in bvec))
            if na == 0 or nb == 0:
                continue  # zero vectors: cosine undefined (NULL in Spark)
            cos = round(sum(x * y for x, y in zip(a, bvec)) / (na * nb), 4)
            if cos >= threshold:
                out.add((i, j))
    return out


@settings(max_examples=10, deadline=None)
@given(vecs=_vecs, threshold=st.sampled_from([0.8, 0.95, 0.999]))
def test_semantic_pairs_one_cell_equals_brute_force(spark, vecs, threshold):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = semantic_dedup_pairs(df, "embedding", "vec_id", n_cells=1,
                                 cosine_threshold=threshold)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == _allpairs_ref(vecs, threshold)


@settings(max_examples=8, deadline=None)
@given(vecs=_vecs)
def test_decontaminate_full_probe_equals_brute_force(spark, vecs):
    # nprobe=n_cells replicates every benchmark vector into every cell,
    # so the flag set must equal the numpy all-pairs threshold check
    from aws_etl_bank_spark.llm.dedup import decontaminate_semantic

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bench = df.withColumn("vec_id", df.vec_id + 1000)
    n_cells = 3
    flagged = decontaminate_semantic(df, bench, "embedding", "vec_id",
                                     n_cells=n_cells, cosine_threshold=0.95,
                                     nprobe=n_cells)
    got = {r["vec_id"] for r in flagged.collect()}
    import math as m
    expect = set()
    for i, a in enumerate(vecs):
        for j, b in enumerate(vecs):
            na = m.sqrt(sum(x * x for x in a)); nb = m.sqrt(sum(x * x for x in b))
            if na == 0 or nb == 0:
                continue
            if round(sum(x * y for x, y in zip(a, b)) / (na * nb), 4) >= 0.95:
                expect.add(i)
    assert got == expect


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_word = st.text(alphabet="abc", min_size=0, max_size=5)


@settings(max_examples=10, deadline=None)
@given(words=st.lists(_word, min_size=1, max_size=8))
def test_fuzzy_ed1_pairs_equal_brute_force(spark, words):
    """SymSpell deletion-neighborhood blocking must be LOSSLESS for
    ed ≤ 1: over a tiny 3-letter alphabet (maximizing collisions,
    empty strings, duplicates) the banded join + levenshtein verify
    equals the O(n²) scan exactly."""
    import itertools

    from aws_etl_bank_spark.llm.dedup import fuzzy_pairs_ed1

    rows = list(enumerate(words))
    df = spark.createDataFrame(rows, "id long, t string")
    got = sorted((r["id_a"], r["id_b"])
                 for r in fuzzy_pairs_ed1(df, "t", "id").collect())
    exp = sorted((i, j) for (i, a), (j, b) in itertools.combinations(rows, 2)
                 if _levenshtein(a, b) <= 1)
    assert got == exp
