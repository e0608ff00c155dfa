"""Dedup pipeline tests: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Strategy (SURVEY.md §5.2): small hand-built corpora with known duplicate
structure + DuckDB cross-checks for the exact ops + recall/precision
properties for the probabilistic ops on the driver's documents table.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_streaming_2_10_spark.catalog import load_table
from flink_streaming_2_10_spark.pipeline.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_neardup_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "The  quick brown FOX jumps over the lazy dog"),  # exact dup (normalized)
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
        (4, "completely different content about spark engines"),
        (5, "completely different content about flink engines"),  # near dup of 4
        (6, "a b"),  # shorter than shingle width
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_keeps_min_id(corpus):
    out = {r["doc_id"]: r["n_dups"] for r in exact_dedup(corpus).collect()}
    assert out[1] == 2  # docs 1 and 2 collapse, min id 1 survives
    assert 2 not in out
    assert out[3] == 1 and out[4] == 1 and out[5] == 1 and out[6] == 1


def test_ngram_jaccard_exact_vs_duckdb(corpus):
    # max_df=None: exact over ALL grams (the production default prunes
    # grams above the 20%-of-corpus document-frequency cap)
    got = ngram_jaccard_pairs(corpus, n=1, threshold=0.5, max_df=None)
    rows = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in got.collect()}
    pdf = corpus.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.sql("""
        WITH t AS (
          SELECT doc_id, unnest(list_distinct(list_filter(
                 regexp_split_to_array(lower(text),'\\W+'), w -> length(w)>0))) AS tok
          FROM documents),
        s AS (SELECT doc_id, count(*) sz FROM t GROUP BY 1),
        i AS (SELECT a.doc_id da, b.doc_id db, count(*) inter
              FROM t a JOIN t b ON a.tok=b.tok AND a.doc_id<b.doc_id GROUP BY 1,2)
        SELECT da, db, inter*1.0/(sa.sz+sb.sz-inter) j
        FROM i JOIN s sa ON i.da=sa.doc_id JOIN s sb ON i.db=sb.doc_id
        WHERE inter*1.0/(sa.sz+sb.sz-inter) >= 0.5
    """).fetchall()
    assert rows == {(a, b): j for a, b, j in want}
    assert (1, 3) in rows  # the planted near-dup must surface


def test_ngram_jaccard_shingles_short_doc_ok(corpus):
    # doc 6 has < 3 words: must yield no shingles, not a descending-sequence crash
    out = ngram_jaccard_pairs(corpus, n=3, threshold=0.1).collect()
    assert all(6 not in (r["doc_a"], r["doc_b"]) for r in out)


def test_ngram_jaccard_max_df_prunes(corpus):
    # "the" appears in docs 1,2,3 — with max_df=2 it can't contribute
    full = ngram_jaccard_pairs(corpus, n=1, threshold=0.0, max_df=None)
    pruned = ngram_jaccard_pairs(corpus, n=1, threshold=0.0, max_df=2)
    f = {(r["doc_a"], r["doc_b"]): r["inter"] for r in full.collect()}
    p = {(r["doc_a"], r["doc_b"]): r["inter"] for r in pruned.collect()}
    assert p.get((1, 3), 0) < f[(1, 3)]


@pytest.mark.parametrize("hasher", ["xxhash64", "md5"])
def test_minhash_similar_sigs_agree_more(corpus, hasher):
    sigs = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures(
            corpus, num_hashes=32, shingle_n=1, hasher=hasher
        ).collect()
    }
    agree = lambda a, b: sum(x == y for x, y in zip(sigs[a], sigs[b]))
    assert agree(1, 2) == 32  # identical token sets → identical signatures
    assert agree(1, 3) > agree(1, 4)  # near-dup agrees more than unrelated


def test_minhash_lsh_surfaces_near_dups(corpus):
    sigs = minhash_signatures(corpus, num_hashes=32, shingle_n=1)
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(sigs, bands=16, rows=2).collect()
    }
    assert (1, 2) in cands and (1, 3) in cands


def test_minhash_end_to_end_verifies_jaccard(corpus):
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_dedup_pairs(
            corpus, num_hashes=32, bands=16, rows=2, shingle_n=1, threshold=0.7
        ).collect()
    }
    assert out[(1, 2)] == 1.0
    assert (1, 3) in out and out[(1, 3)] >= 0.7
    assert all(j >= 0.7 for j in out.values())  # verify step enforces exactness


def test_minhash_recall_on_testdata(spark):
    """LSH recall vs ground truth on the driver's corpus: every planted
    3-gram near-dup pair (jaccard ≥ 0.7) must be surfaced with 32x4 bands."""
    docs = load_table(spark, SF_DIR, "documents")
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.7).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dedup_pairs(
            docs, num_hashes=128, bands=32, rows=4, shingle_n=3, threshold=0.7
        ).collect()
    }
    assert truth, "testdata should contain planted near-dups"
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9
    assert got <= truth  # precision 1.0 by construction (verify step)


@pytest.mark.parametrize("hasher,bits", [("xxhash64", 64), ("md5", 60)])
def test_simhash_hamming_orders_similarity(corpus, hasher, bits):
    fps = simhash_fingerprints(corpus, bits=bits, hasher=hasher)
    vals = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    ham = lambda a, b: bin((vals[a] ^ vals[b]) & ((1 << 64) - 1)).count("1")
    assert ham(1, 2) == 0  # same token multiset → same fingerprint
    assert ham(1, 3) < ham(1, 4)


def test_simhash_neardup_pairs_pigeonhole(corpus):
    fps = simhash_fingerprints(corpus)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_neardup_pairs(fps, max_hamming=3, chunks=4).collect()
    }
    assert pairs[(1, 2)] == 0
    # exhaustive check: every pair under the threshold is found
    vals = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    ids = sorted(vals)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((vals[a] ^ vals[b]) & ((1 << 64) - 1)).count("1")
            assert ((a, b) in pairs) == (h <= 3), (a, b, h)


def test_ngram_jaccard_fractional_max_df_engages(spark):
    # Stop-token-heavy fixture: three tokens appear in EVERY doc. The
    # fractional default (20% of corpus -> cap 2 here) must prune them via
    # the broadcast anti-join, leaving no shared grams at all.
    rows = [
        (i, f"the common filler word{i} unique{i} thing{i}") for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pruned = ngram_jaccard_pairs(df, n=1, threshold=0.0, max_df=0.2)
    assert pruned.count() == 0  # every shared token was a stop token
    full = ngram_jaccard_pairs(df, n=1, threshold=0.0, max_df=None)
    assert full.count() == 45  # all 10·9/2 pairs share the stop tokens


def test_minhash_banding_mismatch_fails_fast(corpus):
    # Composition-level check: bands*rows must equal num_hashes.
    with pytest.raises(ValueError, match="bands\\*rows"):
        minhash_dedup_pairs(corpus, num_hashes=32, bands=16, rows=4)
    # Expression-level guard: candidates over a mismatched signature raise
    # at execution instead of silently corrupting band buckets. Under ANSI
    # the out-of-range element_at itself throws first; under non-ANSI the
    # assert_true guard catches what would otherwise be silent NULLs —
    # either way the job fails loudly.
    sigs = minhash_signatures(corpus, num_hashes=32, shingle_n=1)
    with pytest.raises(
        Exception, match="signature length|ArrayIndexOutOfBounds|INVALID_ARRAY_INDEX"
    ):
        minhash_lsh_candidates(sigs, bands=16, rows=4).collect()


def test_ngram_jaccard_unpruned_refused_at_scale(spark, monkeypatch):
    """max_df=None (no stop-gram pruning) must refuse above the corpus
    ceiling instead of launching an unbounded Σdf² self-join."""
    from flink_streaming_2_10_spark.pipeline import dedup as dd

    df = spark.createDataFrame(
        [(i, "the same text") for i in range(10)], ["doc_id", "text"]
    )
    monkeypatch.setattr(dd, "MAX_UNPRUNED_DOCS", 5)
    with pytest.raises(ValueError, match="max_df=None"):
        dd.ngram_jaccard_pairs(df, n=1, threshold=0.0, max_df=None)
    # below the ceiling None still works (oracle-replay path)
    monkeypatch.setattr(dd, "MAX_UNPRUNED_DOCS", 100)
    assert dd.ngram_jaccard_pairs(df, n=1, threshold=0.0, max_df=None).count() == 45
