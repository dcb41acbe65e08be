"""TF-IDF top-terms, BM25 search, char entropy (operators/ranking.py +
functions/text.char_entropy_cols) vs hand-computed references."""

import math

import pytest

from cordon_spark.functions.text import char_entropy_cols
from cordon_spark.operators.ranking import bm25_search, tfidf_top_terms

DOCS = [
    (0, "spark shuffles data across the cluster"),
    (1, "spark spark spark tuning guide"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "join strategies broadcast join shuffle join"),
    (4, ""),
    (5, None),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _tokenize(t):
    return (t or "").lower().split()


def test_tfidf_matches_manual(spark, docs):
    got = {
        (r.doc_id, r.term): (r.rank, r.tfidf)
        for r in tfidf_top_terms(docs, k=3).collect()
    }
    # manual smooth-idf reference
    n_docs = len(DOCS)
    toks = {i: _tokenize(t) for i, t in DOCS}
    df = {}
    for ts in toks.values():
        for term in set(ts):
            df[term] = df.get(term, 0) + 1
    for i, ts in toks.items():
        scores = {}
        for term in set(ts):
            tf = ts.count(term)
            scores[term] = tf * (math.log((n_docs + 1) / (df[term] + 1)) + 1)
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rank, (term, score) in enumerate(top, 1):
            assert (i, term) in got, (i, term)
            assert got[(i, term)][0] == rank
            assert got[(i, term)][1] == pytest.approx(score, rel=1e-12)
    # empty/null docs contribute no terms
    assert not any(d in (4, 5) for d, _ in got)


def test_tfidf_rare_term_outranks_common(spark, docs):
    """A term unique to one doc must outrank one appearing everywhere
    (the whole point of idf)."""
    rows = {r.term: r.rank for r in tfidf_top_terms(docs, k=10).collect()
            if r.doc_id == 0}
    assert rows["shuffles"] < rows["the"]


def test_bm25_matches_manual(spark, docs):
    query = ["spark", "join"]
    got = {r.doc_id: float(r.score) for r in bm25_search(docs, query).collect()}
    toks = {i: _tokenize(t) for i, t in DOCS}
    n_docs = len(DOCS)
    avgdl = sum(len(ts) for ts in toks.values()) / n_docs
    df = {t: sum(1 for ts in toks.values() if t in ts) for t in query}
    k1, b = 1.2, 0.75
    for i, ts in toks.items():
        score = 0.0
        for t in query:
            tf = ts.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        if score > 0:
            assert got[i] == pytest.approx(score, abs=5e-6)  # decimal(20,6) sum
        else:
            assert i not in got  # no matching term -> no row
    # tf saturation: doc 1 (3x spark) scores higher than doc 0 (1x)
    # but nowhere near 3x (k1 bounds term contribution)
    assert got[1] > got[0]
    assert got[1] < 2.5 * got[0]


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "ab"), (2, "abcd"), (3, ""), (4, None), (5, "aabb")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.char_entropy for r in char_entropy_cols(df).collect()}
    assert got[0] == pytest.approx(0.0)         # one symbol -> zero bits
    assert got[1] == pytest.approx(1.0)         # uniform over 2
    assert got[2] == pytest.approx(2.0)         # uniform over 4
    assert got[3] == 0.0 and got[4] == 0.0      # empty/null -> 0
    assert got[5] == pytest.approx(1.0)
    # manual check on a skewed string: 3 a, 1 b
    df2 = spark.createDataFrame([(0, "aaab")], "doc_id long, text string")
    h = char_entropy_cols(df2).collect()[0].char_entropy
    expect = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert h == pytest.approx(expect, rel=1e-12)


def test_char_entropy_partition_invariant(spark, docs):
    a = {r.doc_id: r.char_entropy for r in char_entropy_cols(docs).collect()}
    b = {
        r.doc_id: r.char_entropy
        for r in char_entropy_cols(docs.repartition(5)).collect()
    }
    assert a == b  # per-row expression: bitwise identical anywhere
