#!/usr/bin/env python
"""Isolated fresh-JVM series for a single query — the convict-or-clear
methodology SCALING.md's pagerank/knn_ivf_pq sections use: one query
per process (fresh JVM), one untimed warmup (cdc_counts_outbound for
JVM/codegen/parquet-footer init), then N timed reps with the bench's
untimed reclaim between reps. Prints one JSON line:

  {"query": name, "sf_dir": ..., "reps": [t1, ...]}

Usage: python tools/bench_isolated.py <query> [n_reps]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    name = sys.argv[1]
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        "--driver-memory 24g "
        "--conf spark.driver.extraJavaOptions=-Xlog:disable pyspark-shell"
    )
    from flink_kafka_filter_transform_spark import get_session

    spark = get_session(
        app_name=f"bench-isolated-{name}",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
    )

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def reclaim() -> None:
        gc.collect()
        spark.catalog.clearCache()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(False)
        from flink_kafka_filter_transform_spark.streaming.pipeline import (
            cleanup_face_scratch,
        )

        cleanup_face_scratch(spark)

    # warmup: JVM + codegen + parquet footer cache (bench.py's choice)
    qs["cdc_counts_outbound"](spark, SF_DIR).write.mode("overwrite").format(
        "noop"
    ).save()
    reclaim()

    reps = []
    for _ in range(n_reps):
        t0 = time.time()
        qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        reps.append(round(time.time() - t0, 3))
        reclaim()
    print(json.dumps({"query": name, "sf_dir": SF_DIR, "reps": reps}))


if __name__ == "__main__":
    main()
