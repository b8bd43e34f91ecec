"""BM25 ranking (llm/ranking.py): hand-computed scores on a tiny corpus,
top-k determinism, and plan shape."""

import math

import pytest

from aws_etl_bank_spark.llm import ranking


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark join spark window"),        # len 4
        (2, "join filter scan"),               # len 3
        (3, "window window window window agg"),  # len 5
        (4, "nothing relevant here at all"),   # len 5
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_expected(corpus_rows, query, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in corpus_rows}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {q: sum(1 for v in toks.values() if q in v) for q in query}
    out = {}
    for d, v in toks.items():
        s, hits = 0.0, 0
        for q in query:
            tf = v.count(q)
            if tf == 0 or dfreq[q] == 0:
                continue
            hits += 1
            idf = math.log(1.0 + (n - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if hits:
            out[d] = (round(s, 4), hits)
    return out


def test_bm25_matches_hand_formula(corpus):
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    expected = _bm25_expected(rows, ["spark", "join", "window"])
    got = {r["doc_id"]: (r["score"], r["n_terms"])
           for r in ranking.bm25_scores(corpus, ["spark", "join", "window"]).collect()}
    assert got == expected


def test_bm25_unmatched_doc_absent(corpus):
    got = {r["doc_id"] for r in
           ranking.bm25_scores(corpus, ["spark"]).collect()}
    assert got == {1}


def test_bm25_query_terms_case_folded(corpus):
    got = {r["doc_id"] for r in
           ranking.bm25_scores(corpus, ["SPARK", "Join"]).collect()}
    assert got == {1, 2}


def test_bm25_topk_order_and_plan(corpus):
    top = ranking.bm25_topk(corpus, ["spark", "join", "window"], k=2)
    rows = top.collect()
    assert len(rows) == 2
    assert rows[0]["score"] >= rows[1]["score"]
    # global top-k must be TakeOrdered (per-partition heap + driver
    # merge), not a full sort shuffle
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_no_explode_no_doc_join(corpus):
    # the columnar form must not explode tokens into (doc, term) rows or
    # join per-doc frames: only the 1-row stats broadcast (BNLJ) allowed
    plan = (ranking.bm25_scores(corpus, ["spark", "join"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Generate" not in plan           # no explode
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan  # no doc-keyed join
    assert plan.count("BroadcastNestedLoopJoin") == 1
