#!/usr/bin/env python
"""sf1 scale spot-check (VERDICT r3 item 8).

Runs every bench.py headline query ONCE (cold) against locally
generated sf1 testdata (tools/gen_testdata.py — 10x the per-round
bench's sf0.1) and compares each time against a reference sf0.1
timing set. A healthy (linear-or-better) operator should run ~<=10x
its sf0.1 time at 10x the data on the same 32 cores; the gate flags
anything past SUPERLINEAR_X (15x, slack for shuffle/spill effects) so
a hidden quadratic can't hide behind a green sf0.1 bench.

Writes BENCH_sf1.json at the repo root:
  {"sf": 1, "queries": {...}, "ratio_vs_sf01": {...},
   "outliers": [...], "sf01_ref": {...}}

Usage:
  python tools/gen_testdata.py --sf 1
  python tools/bench_sf1.py [--ref BENCH_r03.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF1_DIR = os.path.join(ROOT, "testdata_local", "sf1")
SUPERLINEAR_X = 15.0


def _load_ref(path: str) -> dict[str, float]:
    """Per-query sf0.1 cold timings from a driver BENCH_r*.json (which
    wraps the bench.py JSON line in a 'parsed'/'tail' envelope) or from
    a raw bench.py output line."""
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"] if isinstance(d["parsed"], dict) else json.loads(d["parsed"])
    # cold-vs-cold when the ref has it (r4+ methodology); r3 refs only
    # carry min-of-2 — slightly flattering for the ref side, i.e. the
    # conservative direction for a superlinearity gate.
    return d.get("cold") or d["queries"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default=os.path.join(ROOT, "BENCH_r03.json"))
    ap.add_argument("--sf-dir", default=SF1_DIR)
    args = ap.parse_args()

    ref = _load_ref(args.ref)

    from flink_kafka_filter_transform_spark import get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # local mode: the driver JVM IS the executor. Spark's 1g default
    # fits sf0.1 but OOMs broadcast builds at sf1 — size the heap for
    # the data like a real cluster would size its executors.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_session(
        app_name="bench-sf1",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.driver.memory": mem},
    )

    import __spark_entry__ as entrymod
    from bench import HEADLINE, SPECIAL

    qs = entrymod.queries()
    qs.update(SPECIAL)

    def run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, args.sf_dir).write.mode("overwrite").format("noop").save()
        elapsed = time.time() - t0
        # same untimed block-manager reclaim as bench.py (r6): without
        # it the 80-query shared JVM accumulates localCheckpoint blocks
        # and later queries absorb earlier queries' residue
        import gc

        gc.collect()
        spark.catalog.clearCache()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(False)
        # r7: reclaim the streaming faces' scratch dirs too (at sf1
        # each face stages a full copy of its source table)
        from flink_kafka_filter_transform_spark.streaming.pipeline import (
            cleanup_face_scratch,
        )

        cleanup_face_scratch(spark)
        return elapsed

    # Warmup mirrors bench.py: absorbs JVM/codegen startup AND builds
    # the CDC fixture parquet cache (a one-time materialization that
    # must not be billed to the first timed cdc query).
    t0 = time.time()
    run("cdc_counts_outbound")
    spark.range(1).limit(1).toArrow()
    print(f"warmup+fixture-build: {time.time() - t0:.1f}s", flush=True)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        try:
            t = run(name)
        except Exception as e:  # record and keep going: one blown query
            errors[name] = str(e).split("\n")[0][:300]  # must not hide the rest
            print(f"{name}: ERROR {errors[name][:120]}", flush=True)
            continue
        timings[name] = round(t, 3)
        r = ref.get(name)
        ratio = f" ({t / r:.1f}x sf0.1)" if r else ""
        print(f"{name}: {t:.2f}s{ratio}", flush=True)

    ratios = {
        n: round(timings[n] / ref[n], 2) for n in timings if n in ref and ref[n] > 0
    }
    # CONFIRM outliers before reporting them: a 76-query shared-JVM
    # session accumulates GC/code-cache noise that can inflate an
    # individual query 3-8x over its fresh-JVM time (r5: doc_chunks
    # measured 8.4s in-session vs 3.1s isolated). A flagged query gets
    # ONE re-run; keep the min — a true algorithmic superlinearity
    # reproduces, session noise does not.
    suspects = [n for n, x in ratios.items() if x > SUPERLINEAR_X]
    for n in suspects:
        t2 = run(n)
        if t2 < timings[n]:
            timings[n] = round(t2, 3)
            ratios[n] = round(t2 / ref[n], 2)
            print(f"{n}: retry {t2:.2f}s ({ratios[n]}x) — first run was noise",
                  flush=True)
    outliers = sorted(
        (n for n, x in ratios.items() if x > SUPERLINEAR_X),
        key=lambda n: -ratios[n],
    )
    out = {
        "sf": 1,
        "cpus": cpus,
        "queries": timings,
        "total_sec": round(sum(timings.values()), 3),
        "ratio_vs_sf01": ratios,
        "superlinear_threshold_x": SUPERLINEAR_X,
        "outliers": outliers,
        "errors": errors,
        "sf01_ref": {n: ref[n] for n in timings if n in ref},
    }
    with open(os.path.join(ROOT, "BENCH_sf1.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"total_sec": out["total_sec"], "outliers": outliers}))
    # end-of-run reclaim of the session-lived layout twins
    # (bucketed/partitioned external tables; their scratch is
    # deliberately NOT face scratch — see _layout_scratch)
    from flink_kafka_filter_transform_spark.operators.relational import (
        cleanup_layout_scratch,
    )

    cleanup_layout_scratch(spark)
    spark.stop()


if __name__ == "__main__":
    main()
