"""First-class feedback iteration: ``iterate()`` — the general driver
loop behind every iterative dataflow in this engine.

The reference module advertises a feedback-iteration example
(``IterateExample``, pom.xml:157 — source stripped from the fork) built
on Flink's ``DataStream.iterate()``: a step function is applied to a
feedback edge until an exit condition routes records out of the loop.
Spark has no feedback edge; the idiomatic equivalent is a DRIVER loop
over checkpointed DataFrames — each round is one declarative plan
Catalyst optimizes independently, and lineage truncation keeps round N
from re-executing rounds 1..N-1. This module extracts that loop (born in
``pipeline/components.py``'s label propagation) into a reusable
operator, so any fixed-point algorithm gets the same machinery:

* **per-round lineage truncation** — ``localCheckpoint`` (executor-disk,
  fastest, the single-JVM default) or dir-based reliable ``checkpoint``
  (survives executor loss; requires ``setCheckpointDir``). Reliable mode
  persists before writing so the checkpoint streams from cache instead
  of re-running the round's lineage.
* **one-scalar convergence probes** — ``metric(df)`` returns a small
  driver value per round (one aggregation job, also the materializing
  action for the lazy checkpoint); the loop stops when it stops moving.
  No join-back against the previous round's state, no second action.
* **round observability** — ``stats["rounds"]`` on return.

At 100 TB the state DataFrame is whatever the algorithm carries (ids and
labels for components, ids and distances for BFS — never document
bodies), and each round costs its own shuffles plus one checkpoint
write; the loop adds nothing super-linear.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Callable

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame, checkpoint: str, eager: bool = True) -> DataFrame:
    """Checkpoint ``df`` under the given mode (``"local"`` |
    ``"reliable"``), truncating its lineage.

    Reliable (dir-based) checkpointing re-RUNS the computation when the
    checkpoint files are written unless the blocks are cached — unlike
    ``localCheckpoint``, which persists computed blocks by construction.
    So reliable mode persists first, writes eagerly from cache, and
    drops the cache immediately.
    """
    if checkpoint == "local":
        return df.localCheckpoint(eager=eager)
    if checkpoint == "reliable":
        df = df.persist()
        out = df.checkpoint(eager=True)
        df.unpersist()
        return out
    raise ValueError(f"checkpoint must be local|reliable, got {checkpoint!r}")


def _round_dir(resume_dir: str, round_no: int) -> str:
    return os.path.join(resume_dir, f"round_{round_no:05d}")


def _last_completed_round(resume_dir: str) -> int | None:
    """Highest round with a _SUCCESS marker (a dir without one is a
    write that died mid-flight and must be ignored)."""
    if not os.path.isdir(resume_dir):
        return None
    done = [
        int(name.split("_", 1)[1])
        for name in os.listdir(resume_dir)
        if name.startswith("round_")
        and os.path.exists(os.path.join(resume_dir, name, "_SUCCESS"))
    ]
    return max(done) if done else None


def iterate(
    initial: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    max_rounds: int,
    metric: Callable[[DataFrame], Any] | None = None,
    checkpoint: str = "local",
    stats: dict | None = None,
    strict: bool = True,
    resume_dir: str | None = None,
    stop_when: Callable[[Any], bool] | None = None,
) -> DataFrame:
    """Apply ``step`` repeatedly until a fixed point (or ``max_rounds``).

    ``step(state, round_no)`` (``round_no`` 1-based) returns the next
    state; each result is lineage-truncated so plans stay round-sized.

    ``metric(state)`` is the convergence probe: a cheap driver-side
    scalar (or tuple) computed once per round — the loop CONVERGES when
    it equals the previous round's value. Design the metric so equality
    implies a fixed point (BFS uses (count, Σdist) — distances only
    decrease, nodes only appear). In local mode the metric's aggregation
    job doubles as the materializing action for the lazy checkpoint, so
    each round runs exactly ONE job.

    ``stop_when(metric_value)``, when given, REPLACES the
    equality-with-previous test: the loop stops the round the predicate
    turns true. Use it when the state itself tracks its own motion
    (components carries a ``changed`` flag, so ``changed-count == 0``
    detects the fixed point IN the round it happens) — this saves the
    extra confirm round equality-testing needs, plus the up-front
    baseline metric job (no previous value is ever compared).

    With ``metric=None`` the loop runs exactly ``max_rounds`` rounds
    (Flink's fixed-iteration shape). With a metric, ``strict=True``
    raises ``RuntimeError`` if the state is still moving after
    ``max_rounds`` rather than returning a non-fixed point.

    ``stats`` (when a dict) receives ``{"rounds": N}`` — rounds actually
    executed — and, when resuming, ``{"resumed_from": K}``.

    ``resume_dir`` makes the loop DRIVER-LOSS durable: each round's state
    is written as parquet to ``{resume_dir}/round_NNNNN`` (the write is
    both the durable checkpoint and the lineage truncation — the next
    round plans against the files), and a relaunch with the same
    ``resume_dir`` continues from the highest round whose _SUCCESS marker
    landed — a 20-round job that dies at round 15 restarts at 15, not 0.
    The convergence baseline is recomputed from the resumed state (the
    metric depends only on state), and superseded round dirs are deleted
    as soon as the next round's write succeeds, so storage is bounded by
    ~2 state copies. The ``checkpoint`` mode is ignored for per-round
    truncation while ``resume_dir`` is set (parquet already truncates);
    pass a durable (shared-filesystem) path on a real cluster.
    """
    if max_rounds < 0:
        raise ValueError(f"max_rounds must be >= 0, got {max_rounds}")
    if stop_when is not None and metric is None:
        # Without a metric there is nothing to feed the predicate; the
        # loop would silently run fixed rounds as if converged.
        raise ValueError("stop_when requires a metric")
    start_round = 0
    state = None
    if resume_dir is not None:
        last = _last_completed_round(resume_dir)
        if last is not None:
            # Read the state from the round that actually exists on disk
            # (older dirs are deleted as rounds supersede them). If a
            # relaunch passes a smaller max_rounds than the last completed
            # round, the loop range below is simply empty and the durable
            # state is returned as-is — clamping the READ would point at a
            # deleted dir.
            start_round = last
            state = initial.sparkSession.read.parquet(_round_dir(resume_dir, last))
            if stats is not None:
                stats["resumed_from"] = last
    if state is None:
        # Initial state stays EAGER (one job): step functions that
        # self-join the state (pointer jumping) reference it on PARALLEL
        # plan branches, and a lazy first materialization lets both
        # branches race to compute the uncached RDD — measured ~8%
        # slower on dedup_components than materializing it once up
        # front. Per-ROUND truncation is lazy (see _advance).
        state = truncate_lineage(initial, checkpoint, eager=True)
    # With stop_when the baseline metric is pointless for fresh runs (no
    # equality test will ever use it) — but a RESUMED durable state may
    # already be a fixed point, so probe it before paying any rounds.
    if stop_when is not None and metric is not None and start_round > 0:
        if stop_when(metric(state)):
            if stats is not None:
                stats["rounds"] = start_round
            return state
    prev = (
        metric(state)
        if metric is not None and stop_when is None
        else None
    )

    def _advance(new_state: DataFrame, round_no: int) -> DataFrame:
        if resume_dir is None:
            # Lazy in local mode: with a metric, the metric job
            # materializes checkpoint + probe in one job; with
            # metric=None (fixed rounds) nothing needs per-round
            # materialization at all — the plan is truncated at
            # checkpoint CALL time either way, and the caller's final
            # action computes the whole round chain in one job instead
            # of one eager checkpoint job per round. Reliable mode is
            # eager in truncate_lineage.
            return truncate_lineage(new_state, checkpoint, eager=False)
        path = _round_dir(resume_dir, round_no)
        new_state.write.mode("overwrite").parquet(path)
        for stale in range(round_no):
            stale_path = _round_dir(resume_dir, stale)
            if os.path.isdir(stale_path):
                shutil.rmtree(stale_path, ignore_errors=True)
        return new_state.sparkSession.read.parquet(path)

    for round_no in range(start_round + 1, max_rounds + 1):
        state = _advance(step(state, round_no), round_no)
        if metric is None:
            continue
        cur = metric(state)
        done = stop_when(cur) if stop_when is not None else cur == prev
        if done:
            if stats is not None:
                stats["rounds"] = round_no
            return state
        prev = cur
    if stats is not None:
        # max(): a resume whose durable state is already past max_rounds
        # runs zero new rounds — report the rounds that actually ran.
        stats["rounds"] = max(max_rounds, start_round)
    if metric is not None and strict and max_rounds > 0 and start_round < max_rounds:
        raise RuntimeError(
            f"iterate: state still moving after {max_rounds} rounds"
        )
    return state
