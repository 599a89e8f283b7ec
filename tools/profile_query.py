#!/usr/bin/env python
"""Per-query job/stage profile via the local Spark UI REST API.

Usage: python tools/profile_query.py q1 q2 ...  (or --all-top N)

For each named query: one untimed warmup rep, reclaim, then a timed rep
during which job/stage metrics are collected from the REST API. Prints
wall seconds, job count, stage count, task count, summed task time, and
the top-5 stages by duration — the §1 'where does the time go' readout
(scheduler overhead shows up as wall >> task_time/cores with hundreds
of tiny stages; a real hot stage shows up as one dominant entry).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        "--driver-memory 24g "
        "--conf spark.driver.extraJavaOptions=-Xlog:disable pyspark-shell"
    )
    from flink_kafka_filter_transform_spark import get_session

    spark = get_session(
        app_name="profile",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
    )
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [n for n in sys.argv[1:] if not n.startswith("-")]

    ui = spark.sparkContext.uiWebUrl
    app = _get(f"{ui}/api/v1/applications")[0]["id"]

    def run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    def reclaim() -> None:
        import gc

        gc.collect()
        spark.catalog.clearCache()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(False)
        from flink_kafka_filter_transform_spark.streaming.pipeline import (
            cleanup_face_scratch,
        )

        cleanup_face_scratch(spark)

    run("cdc_counts_outbound")  # session warmup
    reclaim()
    out = {}
    for name in names:
        run(name)  # warmup rep (codegen/caches)
        reclaim()
        jobs_before = {j["jobId"] for j in _get(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded")}
        wall = run(name)
        jobs = [
            j
            for j in _get(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for s in _get(f"{ui}/api/v1/applications/{app}/stages?status=complete"):
            if s["stageId"] in stage_ids:
                stages.append(s)
        n_tasks = sum(s["numCompleteTasks"] for s in stages)
        task_time = sum(s.get("executorRunTime", 0) for s in stages) / 1000.0
        sched = sorted(
            (
                (
                    (s.get("completionTime") and s.get("firstTaskLaunchedTime"))
                    and s["stageId"],
                    s.get("executorRunTime", 0) / 1000.0,
                    s["numCompleteTasks"],
                    s["name"].split()[0],
                )
                for s in stages
            ),
            key=lambda t: -t[1],
        )[:5]
        out[name] = {
            "wall_s": round(wall, 2),
            "jobs": len(jobs),
            "stages": len(stages),
            "tasks": n_tasks,
            "task_time_s": round(task_time, 1),
            "top_stages": [(t[3], round(t[1], 2), t[2]) for t in sched],
        }
        print(name, json.dumps(out[name]), flush=True)
        reclaim()
    print("SUMMARY")
    for n, d in out.items():
        print(
            f"{d['wall_s']:8.2f}s  {d['jobs']:4d} jobs {d['stages']:5d} stages "
            f"{d['tasks']:6d} tasks {d['task_time_s']:8.1f}s task-time  {n}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
