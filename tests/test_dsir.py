"""DSIR-style hashed n-gram importance scoring (pipeline/dsir.py)."""

from __future__ import annotations

import hashlib
import re

import pytest

from flink_streaming_2_10_spark.pipeline.dsir import (
    dsir_importance_scores,
    hashed_gram_buckets,
)

ROWS = [
    (1, "the quick brown fox jumps", "en"),
    (2, "the quick brown fox leaps", "en"),
    (3, "der schnelle braune fuchs", "de"),
    (4, "le renard brun rapide", "fr"),
    (5, "the quick red fox", "en"),
    (6, "", "en"),
    (7, "single", "en"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string"
    )


def _grams(text: str, n: int) -> list[str]:
    words = [w for w in re.split(r"\W+", text.lower()) if w]
    return [
        " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
    ]


def _bucket(gram: str, B: int) -> int:
    h = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
    return h % B


def _expected_scores(rows, n: int, B: int, target_lang: str):
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    for _, text, lang in rows:
        for g in _grams(text, n):
            b = _bucket(g, B)
            raw[b] = raw.get(b, 0) + 1
            if lang == target_lang:
                tgt[b] = tgt.get(b, 0) + 1
    out = {}
    for doc_id, text, _ in rows:
        gs = _grams(text, n)
        if not gs:
            out[doc_id] = (0, 0.0)
            continue
        acc = 0.0
        for g in gs:
            b = _bucket(g, B)
            acc += (tgt.get(b, 0) + 1) / (raw.get(b, 0) + 1)
        out[doc_id] = (len(gs), acc / len(gs))
    return out


@pytest.mark.parametrize("n,B", [(2, 4096), (1, 64), (2, 8)])
def test_scores_match_pure_python_replay(docs, n, B):
    got = {
        r["doc_id"]: (r["n_grams"], r["dsir_score"])
        for r in dsir_importance_scores(
            docs,
            docs.filter("lang = 'en'"),
            n=n,
            num_buckets=B,
            hasher="md5",
        ).collect()
    }
    expect = _expected_scores(ROWS, n, B, "en")
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][0] == expect[k][0], k
        assert got[k][1] == pytest.approx(expect[k][1], abs=1e-12), k


def test_target_language_ranks_above_others(docs):
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_importance_scores(
            docs,
            docs.filter("lang = 'en'"),
            n=2,
            num_buckets=4096,
            hasher="md5",
        ).collect()
    }
    en = [got[i] for i in (1, 2, 5)]
    other = [got[i] for i in (3, 4)]
    assert min(en) > max(other)


def test_gramless_docs_score_zero(docs):
    got = {
        r["doc_id"]: r.asDict()
        for r in dsir_importance_scores(
            docs, docs.filter("lang = 'en'"), n=2, num_buckets=64
        ).collect()
    }
    # Empty doc and 1-token doc have no bigrams.
    for doc_id in (6, 7):
        assert got[doc_id]["n_grams"] == 0
        assert got[doc_id]["dsir_score"] == 0.0


def test_external_target_corpus(docs, spark):
    # Target can be a separate clean corpus, not a subset.
    clean = spark.createDataFrame(
        [(100, "the quick brown fox runs", "en")],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_importance_scores(
            docs, clean, n=2, num_buckets=4096, hasher="md5"
        ).collect()
    }
    assert got[1] > got[3]


def test_posting_face_positions_and_buckets(docs):
    rows = hashed_gram_buckets(
        docs.filter("doc_id = 1"), n=2, num_buckets=4096, hasher="md5"
    ).collect()
    got = {(r["pos"], r["bucket"]) for r in rows}
    expect = {
        (i + 1, _bucket(g, 4096))
        for i, g in enumerate(_grams(ROWS[0][1], 2))
    }
    assert got == expect


def test_xxhash_production_path_runs(docs):
    out = dsir_importance_scores(
        docs, docs.filter("lang = 'en'"), n=2, num_buckets=4096
    ).collect()
    assert len(out) == len(ROWS)
    assert all(0.0 <= r["dsir_score"] <= 4096.0 for r in out)


def test_model_face_bit_equal_to_inline_training(docs):
    from flink_streaming_2_10_spark.pipeline.dsir import (
        dsir_importance_scores,
        dsir_model,
        score_with_dsir_model,
    )

    tgt = docs.filter("lang = 'en'")
    inline = {
        r["doc_id"]: (r["n_grams"], r["dsir_score"])
        for r in dsir_importance_scores(
            docs, tgt, n=2, num_buckets=256, hasher="md5"
        ).collect()
    }
    model = dsir_model(docs, tgt, n=2, num_buckets=256, hasher="md5")
    scored = {
        r["doc_id"]: (r["n_grams"], r["dsir_score"])
        for r in score_with_dsir_model(docs, model).collect()
    }
    assert scored == inline  # bit-exact, not approx


def test_model_face_scores_a_stream(docs, spark, tmp_path):
    from flink_streaming_2_10_spark.pipeline.dsir import (
        dsir_model,
        score_with_dsir_model,
    )

    src = str(tmp_path / "src")
    docs.select("doc_id", "text").write.parquet(src)
    model = dsir_model(
        docs, docs.filter("lang = 'en'"), n=2, num_buckets=256,
        hasher="md5",
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        src
    )
    q = (
        score_with_dsir_model(stream, model)
        .writeStream.format("memory")
        .queryName("dsir_stream_scores")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["n_grams"], r["dsir_score"])
        for r in spark.sql("select * from dsir_stream_scores").collect()
    }
    batch = {
        r["doc_id"]: (r["n_grams"], r["dsir_score"])
        for r in score_with_dsir_model(
            docs.select("doc_id", "text"), model
        ).collect()
    }
    assert got == batch


class TestImportanceResample:
    @staticmethod
    def _scored(spark, n=400):
        from pyspark.sql import functions as F

        # Half the ids score 1.0, half 0.1.
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, F.lit(1.0))
            .otherwise(F.lit(0.1))
            .alias("dsir_score"),
        )

    def test_keep_rate_tracks_score(self, spark):
        from flink_streaming_2_10_spark.pipeline.dsir import (
            importance_resample,
        )

        scored = self._scored(spark)
        kept = importance_resample(scored, scale=1.0).collect()
        hi = sum(1 for r in kept if r["dsir_score"] == 1.0)
        lo = sum(1 for r in kept if r["dsir_score"] == 0.1)
        # score 1.0 -> p = 1 (all 200 kept); score 0.1 -> p = 0.1.
        assert hi == 200
        assert 5 <= lo <= 45  # 200 draws at p=0.1

    def test_deterministic_and_nested_in_scale(self, spark):
        from flink_streaming_2_10_spark.pipeline.dsir import (
            importance_resample,
        )

        scored = self._scored(spark)
        a = {r["doc_id"] for r in importance_resample(scored, scale=0.3).collect()}
        b = {r["doc_id"] for r in importance_resample(scored, scale=0.3).collect()}
        assert a == b  # rerun identical
        wider = {
            r["doc_id"]
            for r in importance_resample(scored, scale=0.6).collect()
        }
        assert a <= wider  # thresholds grow monotonically with scale

    def test_zero_scores_never_kept_and_empty_max_guard(self, spark):
        from pyspark.sql import functions as F

        from flink_streaming_2_10_spark.pipeline.dsir import (
            importance_resample,
        )

        scored = spark.range(50).select(
            F.col("id").alias("doc_id"), F.lit(0.0).alias("dsir_score")
        )
        assert importance_resample(scored, scale=5.0).count() == 0

    def test_salt_changes_membership_not_rate_class(self, spark):
        from flink_streaming_2_10_spark.pipeline.dsir import (
            importance_resample,
        )

        scored = self._scored(spark)
        a = {r["doc_id"] for r in importance_resample(scored, scale=0.5, salt="x").collect()}
        b = {r["doc_id"] for r in importance_resample(scored, scale=0.5, salt="y").collect()}
        assert a != b


def test_fused_target_pred_bit_equal_to_two_pass(docs):
    """r19 one-pass count tables: passing target_pred (the predicate
    that selects the target slice) must score BIT-IDENTICALLY to the
    two-pass form with target = docs.filter(pred) — the fused path is
    one conditional aggregation over the same exploded grams, so the
    integer count tables (and hence every double) are equal, including
    the NULL-predicate-drops-row semantics of filter()."""
    from pyspark.sql import functions as F

    two_pass = {
        r["doc_id"]: (r["n_grams"], r["dsir_score"])
        for r in dsir_importance_scores(
            docs, docs.filter("lang = 'en'"), n=2, num_buckets=512,
            hasher="md5",
        ).collect()
    }
    fused = {
        r["doc_id"]: (r["n_grams"], r["dsir_score"])
        for r in dsir_importance_scores(
            docs, None, target_pred=F.col("lang") == "en", n=2,
            num_buckets=512, hasher="md5",
        ).collect()
    }
    assert fused == two_pass


def test_target_and_target_pred_are_mutually_exclusive(docs):
    from pyspark.sql import functions as F

    with pytest.raises(ValueError):
        dsir_importance_scores(docs, None)
    with pytest.raises(ValueError):
        dsir_importance_scores(
            docs, docs, target_pred=F.col("lang") == "en"
        )
