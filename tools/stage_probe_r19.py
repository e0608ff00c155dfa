"""Structural probe: run ONE query to the noop sink in a fresh session
and report executed job/stage/task counts — host-phase-IMMUNE evidence
(a removed pass/exchange changes these counts; container speed cannot).

Usage: python tools/stage_probe_r19.py <query> [query...]
Prints one JSON line per query: {"query":..., "jobs":N, "stages":N,
"tasks":N} (stages = distinct non-skipped stage attempts with tasks)."""
from __future__ import annotations

import json
import os
import sys

def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    import __spark_entry__ as entrymod
    from flink_streaming_2_10_spark.pipeline.caching import release_cached
    from flink_streaming_2_10_spark.session import get_spark

    spark = get_spark("stage-probe-r19")
    sc = spark.sparkContext
    queries = entrymod.queries()
    for name in names:
        sc.setJobGroup(f"probe:{name}", name)
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        st = sc.statusTracker()
        jobs = st.getJobIdsForGroup(f"probe:{name}")
        stages: set[int] = set()
        tasks = 0
        for j in jobs:
            info = st.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                si = st.getStageInfo(s)
                if si is not None and si.numTasks > 0 and s not in stages:
                    stages.add(s)
                    tasks += si.numTasks
        print(
            json.dumps(
                {"query": name, "jobs": len(jobs), "stages": len(stages),
                 "tasks": tasks}
            ),
            flush=True,
        )
        sc.setJobGroup(None, None)
        release_cached()
    spark.stop()

if __name__ == "__main__":
    main()
