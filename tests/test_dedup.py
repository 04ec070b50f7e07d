"""Dedup operators vs independent Python models (the engine-specific
xxhash64-based paths that the SQL oracle can't check)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zcurve_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
    word_ngrams,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    d.count()
    return d


@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    """Inject exact + near duplicates so dedup paths have positives."""
    base = docs.limit(20).select("doc_id", "text", "lang")
    exact = base.select((F.col("doc_id") + 10_000).alias("doc_id"), "text", "lang")
    near = base.select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail tweak")).alias("text"),
        "lang",
    )
    return docs.select("doc_id", "text", "lang").union(exact).union(near).cache()


def _py_ngrams(text, n=3):
    w = text.split(" ")
    return set(" ".join(w[i : i + n]) for i in range(len(w) - n + 1)) if len(w) >= n else set()


def _py_jaccard(a, b):
    g1, g2 = _py_ngrams(a), _py_ngrams(b)
    u = len(g1 | g2)
    return (1000 * len(g1 & g2)) // max(u, 1)


class TestExactDedup:
    def test_groups(self, spark, docs_with_dups):
        out = exact_dedup(docs_with_dups).toPandas()
        assert (out.n_docs == 2).sum() == 20  # the injected exact dups
        assert out.n_docs.sum() == docs_with_dups.count()


class TestNgramJaccard:
    def test_matches_python_model(self, spark, docs):
        pdf = docs.limit(60).toPandas()
        got = ngram_jaccard_pairs(
            docs.limit(60), min_jaccard_milli=1, block_col="lang"
        ).toPandas()
        got_pairs = {(r.a_id, r.b_id): r.jac_milli for r in got.itertuples()}
        by_lang = {}
        for r in pdf.itertuples():
            by_lang.setdefault(r.lang, []).append((r.doc_id, r.text))
        expect = {}
        for rows in by_lang.values():
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    a, b = sorted([rows[i], rows[j]])
                    jm = _py_jaccard(a[1], b[1])
                    if jm >= 1:
                        expect[(a[0], b[0])] = jm
        assert got_pairs == expect

    def test_word_ngrams_edge_cases(self, spark):
        df = spark.createDataFrame([("",), ("a",), ("a b",), ("a b c",), ("a b c d",)], "t string")
        out = df.select(word_ngrams("t", 3).alias("g")).collect()
        assert [len(r.g) for r in out] == [0, 0, 0, 1, 2]


class TestMinhashLSH:
    def test_finds_injected_near_dups(self, docs_with_dups):
        pairs = minhash_lsh_pairs(docs_with_dups, verify_min_jaccard_milli=800).toPandas()
        found = set(map(tuple, pairs[["a_id", "b_id"]].values.tolist()))
        # every exact dup (jaccard 1000) must be found; near dups highly likely
        exact_expected = {(i, i + 10_000) for i in range(20)}
        missing = exact_expected - found
        assert not missing, f"missing exact dups: {missing}"
        # verification step guarantees no false positives below threshold
        assert (pairs.jac_milli >= 800).all()

    def test_verified_jaccard_matches_model(self, docs_with_dups):
        pdf = docs_with_dups.toPandas().set_index("doc_id").text.to_dict()
        pairs = minhash_lsh_pairs(docs_with_dups, verify_min_jaccard_milli=500).toPandas()
        for r in pairs.itertuples():
            assert _py_jaccard(pdf[r.a_id], pdf[r.b_id]) == r.jac_milli


class TestSimhash:
    def test_exact_dups_have_zero_hamming(self, docs_with_dups):
        pairs = simhash_neardup_pairs(docs_with_dups, max_hamming=0).toPandas()
        found = set(map(tuple, pairs[["a_id", "b_id"]].values.tolist()))
        assert {(i, i + 10_000) for i in range(20)} <= found
        assert (pairs.hamming == 0).all()

    def test_near_dups_within_hamming(self, docs_with_dups):
        pairs = simhash_neardup_pairs(docs_with_dups, max_hamming=12).toPandas()
        found = set(map(tuple, pairs[["a_id", "b_id"]].values.tolist()))
        near = {(i, i + 20_000) for i in range(20)}
        # one appended token flips few simhash bits; most near pairs found
        assert len(found & near) >= 15
