"""Composed shard-prep pipeline: language gate + quality floor + exact
dedup + token budget in one job (pipeline/shard.py)."""

from __future__ import annotations

import pytest

from flink_streaming_2_10_spark.pipeline.shard import prepare_training_shard
from flink_streaming_2_10_spark.pipeline.textstats import (
    language_id,
    quality_scores,
)


@pytest.fixture(scope="module")
def shard_corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog in the field"),
        (2, "The  quick brown fox jumps OVER the lazy dog in the field"),
        (3, "it is a truth that you know and that it is good to see here"),
        (4, "der die und das ist ein gutes beispiel mit nicht zu wenig"),
        (5, "$$$ ### 12345 @@@ !!!"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_shard_filters_dedups_and_budgets(shard_corpus):
    out = {r["doc_id"]: r for r in prepare_training_shard(shard_corpus).collect()}
    # doc 2 is a case/whitespace dup of doc 1 -> min-id survivor with n_dups 2
    assert set(out) == {1, 3}
    assert out[1]["n_dups"] == 2 and out[3]["n_dups"] == 1
    # survivor stats are the survivor's own (doc 1, not doc 2)
    assert out[1]["ws_tokens"] == 12
    assert out[1]["bpe_tokens"] >= 12
    assert all(r["quality"] >= 0.5 for r in out.values())


def test_shard_gates_match_component_operators(shard_corpus):
    # The composed filter must agree with the standalone operators it fuses.
    langs = {r["doc_id"]: r["lang_pred"] for r in language_id(shard_corpus).collect()}
    quals = {r["doc_id"]: r["quality"] for r in quality_scores(shard_corpus).collect()}
    eligible = {
        d for d in langs if langs[d] == "en" and quals[d] >= 0.5
    }
    assert eligible == {1, 2, 3}  # de doc and junk doc gated out
    survivors = {
        r["doc_id"] for r in prepare_training_shard(shard_corpus).collect()
    }
    assert survivors == {1, 3}  # eligible minus the dup of doc 1


def test_curated_shard_adds_repetition_and_decontamination_gates(spark):
    from flink_streaming_2_10_spark.pipeline.shard import prepare_curated_shard

    eval_text = "it is a truth that you know and that it is good to see here"
    rows = [
        (1, "the quick brown fox jumps over the lazy dog in the field"),
        # verbatim eval copy -> decontamination must drop it
        (3, eval_text),
        # repetition-stuffed but English and long enough to pass quality:
        # 4 distinct words over 20 -> dup_word_frac 0.8 > 0.6
        (6, "the dog the dog the dog the dog the dog "
            "is it is it is it is it is it good dog"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = spark.createDataFrame([(100, eval_text)], ["doc_id", "text"])

    out = {
        r["doc_id"]: r
        for r in prepare_curated_shard(
            docs, bench, lang="en", min_quality=0.5,
            max_dup_word_frac=0.6, decontam_n=5,
        ).collect()
    }
    assert set(out) == {1}
    assert out[1]["dup_word_frac"] < 0.6

    # v1 (no curation gates) keeps all three -> the gates did the work
    v1 = {r["doc_id"] for r in prepare_training_shard(docs).collect()}
    assert v1 == {1, 3, 6}


def test_curated_shard_query_matches_oracle(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    got = entrymod.queries()["training_shard_curated"](spark, SF_SMALL)
    assert_df_matches_oracle(
        got, duck, entrymod.oracle_sql()["training_shard_curated"]
    )
    # curated output is a subset of the v1 manifest's survivors
    v1_ids = {
        r["doc_id"]
        for r in entrymod.queries()["training_shard"](spark, SF_SMALL).collect()
    }
    got_ids = {r["doc_id"] for r in got.collect()}
    assert got_ids <= v1_ids


def test_curate_neardup_resumes_after_driver_loss(spark, tmp_path, monkeypatch):
    """Composed-DAG durability (VERDICT r6 #6): a driver loss mid
    component-loop inside ``curate_corpus_neardup`` must leave durable
    round state, and a relaunch with the same ``resume_dir`` must resume
    from the last completed round — producing the same manifest as an
    undisturbed run."""
    import os

    from flink_streaming_2_10_spark.pipeline import components as comp_mod
    from flink_streaming_2_10_spark.pipeline.shard import curate_corpus_neardup

    # A 16-doc sliding-window near-dup CHAIN (windows of 40 tokens over a
    # 55-token stopword-rich sequence: neighbors at offset k share
    # (40-k)/(40+k) of their 3-gram sets) -> one transitive cluster the
    # min-label loop needs several rounds to resolve.
    stop = ["the", "and", "of", "to", "in", "is", "that", "it"]
    tokens = []
    for i in range(56):
        tokens.append(stop[i % len(stop)])
        tokens.append(f"word{i:02d}")
    docs = spark.createDataFrame(
        [(i, " ".join(tokens[2 * i : 2 * i + 80])) for i in range(16)],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(999, "benchmark sentence that matches nothing here at all today")],
        ["doc_id", "text"],
    )

    # Inject a driver death at round 2 of the component loop, composed-DAG
    # level: wrap the iterate() components uses, keep everything else real.
    real_iterate = comp_mod.iterate
    boom = {"at": 2}
    captured: dict = {}

    def fragile_iterate(df0, step, **kw):
        def fragile_step(d, round_no):
            if round_no == boom["at"]:
                raise RuntimeError("driver died")
            return step(d, round_no)

        kw["stats"] = captured
        return real_iterate(df0, fragile_step, **kw)

    monkeypatch.setattr(comp_mod, "iterate", fragile_iterate)

    rd = str(tmp_path / "cc")
    with pytest.raises(RuntimeError, match="driver died"):
        curate_corpus_neardup(docs, bench, resume_dir=rd)
    # round 1 landed durably before the crash
    assert any(n.startswith("round_") for n in os.listdir(rd))

    boom["at"] = None  # relaunch
    resumed = curate_corpus_neardup(docs, bench, resume_dir=rd)
    assert captured.get("resumed_from", 0) >= 1
    got = {(r["doc_id"], r["cluster_size"]) for r in resumed.collect()}

    monkeypatch.setattr(comp_mod, "iterate", real_iterate)
    fresh = curate_corpus_neardup(docs, bench)
    assert got == {
        (r["doc_id"], r["cluster_size"]) for r in fresh.collect()
    }
    assert got  # the chain produced at least one surviving canonical


def test_curate_corpus_quality_equals_manual_chain(spark):
    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.pipeline.dsir import (
        dsir_importance_scores,
        importance_resample,
    )
    from flink_streaming_2_10_spark.pipeline.segdedup import (
        strip_repeated_segments,
    )
    from flink_streaming_2_10_spark.pipeline.shard import (
        curate_corpus_quality,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(["common"] * 5 + [f"rare{i}w{j}" for j in range(6)]), "en" if i % 2 else "de")
            for i in range(40)
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in curate_corpus_quality(
            docs, min_seg_count=100, num_buckets=256, scale=1.0,
        ).collect()
    }
    stripped = strip_repeated_segments(
        docs, delimiter="[ \\t\\n\\x0B\\f\\r]+", joiner=" ",
        min_count=100, keep="first", hasher="md5",
    )
    enriched = stripped.filter("n_segments > n_removed").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    scored = dsir_importance_scores(
        enriched, enriched.filter(F.col("lang") == "en"),
        n=2, num_buckets=256, hasher="md5",
    )
    expect = {
        r["doc_id"]: r.asDict()
        for r in importance_resample(scored, scale=1.0)
        .join(enriched.select("doc_id", "n_removed"), "doc_id")
        .select("doc_id", "n_removed", "n_grams", "dsir_score")
        .collect()
    }
    assert got == expect
    # "common" x5 per doc x40 docs = 200 >= 100: stripped everywhere
    # except the single global keeper -> n_removed 5 (or 4 for keeper).
    assert got and all(r["n_removed"] in (4, 5) for r in got.values())


def test_curate_corpus_quality_drops_fully_stripped_docs(spark):
    """ADVICE r11: the gate now drops docs the strip EMPTIED (every
    segment removed), not only docs that had zero segments — previously
    such docs survived to scoring (harmless only because score-0 rows
    never resample)."""
    from flink_streaming_2_10_spark.pipeline.shard import (
        curate_corpus_quality,
    )

    # doc 99 consists ONLY of the boilerplate token (and is not the
    # global keeper: keeper is the smallest (doc_id, pos)), so the strip
    # empties it entirely; docs 0..39 keep their rare tokens.
    rows = [
        (i, " ".join(["common"] * 5 + [f"rare{i}w{j}" for j in range(6)]),
         "en")
        for i in range(40)
    ] + [(99, "common common common", "en")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept = {
        r["doc_id"]
        for r in curate_corpus_quality(
            docs, min_seg_count=100, num_buckets=256, scale=1.0
        ).collect()
    }
    assert 99 not in kept
    assert kept  # the chain still keeps the real documents
