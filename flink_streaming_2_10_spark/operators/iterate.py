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


def iterate(
    initial: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    max_rounds: int,
    metric: Callable[[DataFrame], Any] | None = None,
    checkpoint: str = "local",
    stats: dict | None = None,
    strict: bool = True,
) -> DataFrame:
    """Apply ``step`` repeatedly until a fixed point (or ``max_rounds``).

    ``step(state, round_no)`` (``round_no`` 1-based) returns the next
    state; each result is lineage-truncated so plans stay round-sized.

    ``metric(state)`` is the convergence probe: a cheap driver-side
    scalar (or tuple) computed once per round — the loop CONVERGES when
    it equals the previous round's value. Design the metric so equality
    implies a fixed point (components uses Σlabel — labels only ever
    decrease; BFS uses (count, Σdist) — distances only decrease, nodes
    only appear). In local mode the metric's aggregation job doubles as
    the materializing action for the lazy checkpoint, so each round runs
    exactly ONE job.

    With ``metric=None`` the loop runs exactly ``max_rounds`` rounds
    (Flink's fixed-iteration shape). With a metric, ``strict=True``
    raises ``RuntimeError`` if the state is still moving after
    ``max_rounds`` rather than returning a non-fixed point.

    ``stats`` (when a dict) receives ``{"rounds": N}`` — rounds actually
    executed.
    """
    if max_rounds < 0:
        raise ValueError(f"max_rounds must be >= 0, got {max_rounds}")
    state = truncate_lineage(initial, checkpoint, eager=True)
    prev = metric(state) if metric is not None else None
    for round_no in range(1, max_rounds + 1):
        # Lazy in local mode: the metric below materializes checkpoint +
        # probe in one job. Reliable mode is eager inside truncate_lineage.
        state = truncate_lineage(step(state, round_no), checkpoint, eager=metric is None)
        if metric is None:
            continue
        cur = metric(state)
        if cur == prev:
            if stats is not None:
                stats["rounds"] = round_no
            return state
        prev = cur
    if stats is not None:
        stats["rounds"] = max_rounds
    if metric is not None and strict and max_rounds > 0:
        raise RuntimeError(
            f"iterate: state still moving after {max_rounds} rounds"
        )
    return state
