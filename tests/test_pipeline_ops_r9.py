"""Round-9 pipeline operators: BM25 sparse retrieval and near-dup-on-ingest."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from plateau_spark.operators.text import bm25_topk


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox"),
        (3, "lorem ipsum dolor sit amet"),
        (4, "a lazy dog sleeps all day the dog dreams"),
        (5, ""),
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_expected(corpus_rows, query_terms, *, k1=1.2, b=0.75):
    """Plain-Python BM25 oracle for a handful of rows."""
    toks = {
        i: [t for t in "".join(c.lower() if c.isalnum() else " " for c in (txt or "")).split() if t]
        for i, txt in corpus_rows
    }
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    scores = {}
    for i, ts in toks.items():
        s = 0.0
        for t in set(query_terms) & set(ts):
            tf = ts.count(t)
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        if s > 0:
            scores[i] = round(s, 6)
    return scores


def test_bm25_matches_hand_oracle(spark, corpus):
    rows = [(r.doc_id, r.text) for r in corpus.collect()]
    out = bm25_topk(corpus, "doc_id", "text", {"q1": "lazy dog"}, k=10)
    got = {r.doc_id: r.score for r in out.collect()}
    assert got == _bm25_expected(rows, ["lazy", "dog"])


def test_bm25_ranking_and_k(spark, corpus):
    out = bm25_topk(corpus, "doc_id", "text", {"q1": "lazy dog"}, k=1).collect()
    assert len(out) == 1
    # doc 4 has dog twice + lazy once: the top hit
    assert out[0].doc_id == 4 and out[0].rank == 1


def test_bm25_multi_query_and_miss(spark, corpus):
    out = bm25_topk(
        corpus, "doc_id", "text", {"a": "quick fox", "b": "ipsum", "c": "zzz"}
    )
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r.query_id, []).append(r.doc_id)
    # query terms absent from the corpus yield no rows (inner join)
    assert "c" not in by_q
    assert by_q["b"] == [3]
    assert set(by_q["a"]) == {1, 2}


def test_bm25_tie_break_deterministic(spark):
    # identical docs → identical scores → id ascending order
    df = spark.createDataFrame(
        [(i, "same text here") for i in range(5)], "doc_id long, text string"
    )
    out = bm25_topk(df, "doc_id", "text", {"q": "same"}, k=3).collect()
    assert [r.doc_id for r in out] == [0, 1, 2]
    assert [r.rank for r in out] == [1, 2, 3]


def test_bm25_rejects_empty_queries(spark, corpus):
    with pytest.raises(ValueError):
        bm25_topk(corpus, "doc_id", "text", {})
