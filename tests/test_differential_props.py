"""Differential property tests: pure-Python reference implementations
of the despan rule and the cross-doc shared-span contract, compared
against the Spark operators on seeded-random corpora. One Spark job per
strategy over the whole corpus batch (not per example), so the
property strength comes cheap."""

from __future__ import annotations

import random

from flink_streaming_2_10_spark.pipeline.caching import release_cached


def _tokenize(text: str):
    import re

    return [w for w in re.split(r"\W+", text.lower()) if w]


def _py_despan(tokens, p_max):
    """Reference: token t (1-based) removed iff some p <= p_max has
    tokens[t-2p..t-p-1] == tokens[t-p..t-1] (0-based slices)."""
    kept = []
    n = len(tokens)
    for t in range(1, n + 1):
        removed = False
        for p in range(1, p_max + 1):
            if t >= 2 * p and tokens[t - 2 * p:t - p] == tokens[t - p:t]:
                removed = True
                break
        if not removed:
            kept.append(tokens[t - 1])
    return kept


def _py_cross_spans(docs, window, min_sharers):
    """Reference: maximal runs of positions whose L-token window occurs
    in >= min_sharers documents (documents counted with exact-duplicate
    multiplicity via normalized-text identity)."""
    toks = {d: _tokenize(t) for d, t in docs}
    norm = {d: " ".join(toks[d]) for d, t in docs}
    counts = {}
    classes = {}
    for d, _ in docs:
        classes.setdefault(norm[d], []).append(d)
    for key, members in classes.items():
        ws = key.split() if key else []
        seen = set()
        for i in range(len(ws) - window + 1):
            seen.add(" ".join(ws[i:i + window]))
        for w in seen:
            counts[w] = counts.get(w, 0) + len(members)
    out = set()
    for d, _ in docs:
        ws = toks[d]
        marked = []
        for i in range(len(ws) - window + 1):
            c = counts.get(" ".join(ws[i:i + window]), 0)
            if c >= min_sharers:
                marked.append((i + 1, c))
        run = []
        for pos, c in marked:
            if run and pos == run[-1][0] + 1:
                run.append((pos, c))
            else:
                if run:
                    out.add((d, run[0][0], run[-1][0] - run[0][0] + window,
                             min(x for _, x in run)))
                run = [(pos, c)]
        if run:
            out.add((d, run[0][0], run[-1][0] - run[0][0] + window,
                     min(x for _, x in run)))
    return out


def _random_corpus(seed, n_docs, vocab, min_len, max_len, dup_frac=0.2):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs = []
    for d in range(n_docs):
        n = rng.randint(min_len, max_len)
        body = [rng.choice(words) for _ in range(n)]
        # inject adjacent repeats and shared phrases at random
        if rng.random() < 0.6 and n > 6:
            p = rng.randint(1, 5)
            k = rng.randint(2, 4)
            at = rng.randrange(max(1, n - p))
            unit = body[at:at + p]
            body[at:at] = unit * (k - 1)
        docs.append((d, " ".join(body)))
    # exact duplicates of earlier docs
    base = len(docs)
    for j in range(int(n_docs * dup_frac)):
        src = rng.randrange(n_docs)
        docs.append((base + j, docs[src][1]))
    return docs


def test_despan_both_strategies_match_python_reference(spark):
    from flink_streaming_2_10_spark.pipeline.textstats import despan_repeated

    docs = _random_corpus(seed=91, n_docs=40, vocab=6, min_len=1, max_len=40)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for p_max in (1, 2, 5, 8):
        want = {
            d: " ".join(_py_despan(_tokenize(t), p_max)) for d, t in docs
        }
        for strategy in ("hof", "window"):
            got = {
                r["doc_id"]: r["despanned_text"]
                for r in despan_repeated(
                    df, max_period=p_max, strategy=strategy
                ).collect()
            }
            assert got == want, (p_max, strategy)
    release_cached()


def test_cross_doc_spans_match_python_reference(spark):
    from flink_streaming_2_10_spark.pipeline.crossdoc import (
        cross_doc_shared_spans,
    )

    # Small vocab forces genuine cross-doc window collisions.
    docs = _random_corpus(seed=17, n_docs=30, vocab=4, min_len=3, max_len=25)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for window, min_sharers in ((3, 2), (4, 3)):
        want = _py_cross_spans(docs, window, min_sharers)
        got = {
            (r["doc_id"], r["span_start"], r["span_len"], r["n_sharers"])
            for r in cross_doc_shared_spans(
                df, window=window, min_sharers=min_sharers
            ).collect()
        }
        release_cached()
        assert got == want, (window, min_sharers)
