"""Round-18 optimization deliverable: dump `explain("formatted")` for
driver queries to plans/r19/<query>_<tag>.txt.

Usage: python tools/plan_capture_r19.py <tag> [query ...]
  tag    = 'before' or 'after'
  query  = optional subset; default all queries().

Plans are captured at the BENCH scale factor (sf0.1, overridable via
SPARK_GRAFT_SF_DIR) so size-driven planner decisions (broadcast
thresholds) match what the bench actually runs. Iterative queries build
their final assembly plan; their per-round shapes are pinned in
tests/test_plans.py.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from flink_streaming_2_10_spark.pipeline.caching import release_cached
    from flink_streaming_2_10_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(repo, "plans", "r19")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan-capture-r19")
    queries = entrymod.queries()
    names = [n for n in sorted(queries) if not only or n in only]
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building plan: {exc}\n"
        finally:
            release_cached()
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
