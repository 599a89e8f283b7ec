#!/usr/bin/env python
"""Measured shuffle budget per headline query — the 100 TB cost model.

Plan gates assert shuffle COUNTS; this tool measures shuffle BYTES.
At 100 TB the dominant movable cost is bytes shuffled: a query whose
shuffle is the size of its AGGREGATE OUTPUT (the map-side-combine
shape) pays ~nothing more as the corpus grows, while one that
shuffles raw rows pays linearly forever. This audit pins each
headline query's measured shuffle volume at a KNOWN corpus size
(sf0.1 unless overridden) so a future change that silently starts
shuffling raw rows — the classic regression: a groupBy key change
that defeats partial aggregation, a projection that widens the
exchange, a join that stops pruning — shows up as a bytes jump in a
diffable artifact, not just a wall-time blur.

Method: per query, snapshot the AppStatusStore's stage list, run the
query to the noop sink TWICE, and attribute to the query the stage
deltas of the SECOND run (steady state: session-memoized relations —
layout twins, trained codebooks — are built in run 1, and exchange
reuse shows as SKIPPED stages contributing 0 bytes, which is exactly
their steady-state cost). Streaming faces are excluded (their cost is
a drain protocol, not a query plan; bench.py reports them separately).

CAVEAT (measured before trusting): the stage `inputBytes` metric
under-counts Spark's vectorized parquet reader by orders of magnitude
(a full 4-column scan of a 10.8 MB lineitem file reports ~18 KB — the
column-chunk reads bypass the tracked FileSystem statistics in this
path), so NO shuffle-to-input ratio is derived; input_bytes is
recorded raw only so future rounds can diff it against itself. The
trustworthy, load-bearing number is shuffle_write_bytes, which comes
from the shuffle writers' own accounting.

Writes SHUFFLE_AUDIT.json and prints a markdown table sorted by
shuffle volume.

Usage: python tools/shuffle_audit.py [--only a,b,c]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _stage_rows(spark):
    """(stage_id, status, input_bytes, shuffle_write, shuffle_read)
    for every stage the app has run, via the same AppStatusStore the
    Spark UI reads (public metrics surface, not an internal API)."""
    jvm = spark._sc._jvm
    gw = spark._sc._gateway
    store = spark._jsparkSession.sparkContext().statusStore()
    seq = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    out = []
    for i in range(seq.size()):
        s = seq.apply(i)
        out.append(
            (s.stageId(), str(s.status()), s.inputBytes(),
             s.shuffleWriteBytes(), s.shuffleReadBytes())
        )
    return out


def main() -> None:
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        "--driver-memory 24g "
        "--conf spark.driver.extraJavaOptions=-Xlog:disable pyspark-shell"
    )
    from flink_kafka_filter_transform_spark import get_session

    spark = get_session(
        app_name="shuffle_audit",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from bench import FACE_QUERIES, HEADLINE

    qs = entrymod.queries()
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        only = sys.argv[2].split(",")
    # faces (streaming drains) are excluded from the default sweep —
    # their second "warm" run re-stages and re-drains a fresh scratch,
    # so a full-suite audit would double every drain — but an
    # EXPLICITLY --only'd face is measurable on purpose (r13, VERDICT
    # r12 item 5: the face family joins the per-sf shuffle-byte
    # discipline; bytes are run-invariant, wall is the drain cost)
    names = [
        n
        for n in HEADLINE
        if n in qs
        and (n not in FACE_QUERIES or (only is not None and n in only))
        and (only is None or n in only)
    ]

    path = os.path.join(_REPO, "SHUFFLE_AUDIT.json")
    payload = {}
    if only is not None and os.path.exists(path):
        with open(path) as f:
            payload = json.load(f)
        # refuse a merge that would misattribute rows measured under
        # different settings to this run's top-level sf_dir/cpus (r10
        # ADVICE): --only against a file from another SF/CPU config
        # must go to a fresh file instead. Checked BEFORE the
        # measurement loop so the refusal is free (r11 review: the
        # original post-loop check threw away minutes of measurement).
        if payload.get("sf_dir") != SF_DIR or payload.get("cpus") != CPUS:
            print(
                f"SHUFFLE_AUDIT.json was measured at sf_dir="
                f"{payload.get('sf_dir')} cpus={payload.get('cpus')}, "
                f"current run is sf_dir={SF_DIR} cpus={CPUS}: refusing "
                "the --only merge (move the old file aside or rerun "
                "without --only)",
                file=sys.stderr,
            )
            raise SystemExit(2)

    rows = {}
    for name in names:
        try:
            # run 1: warm memoized relations (layout twins, codebooks)
            qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            seen = {s[0] for s in _stage_rows(spark)}
            t0 = time.time()
            qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            wall = time.time() - t0
            new = [s for s in _stage_rows(spark) if s[0] not in seen]
            inp = sum(s[2] for s in new)
            shw = sum(s[3] for s in new)
            shr = sum(s[4] for s in new)
            rows[name] = {
                "input_bytes": inp,
                "shuffle_write_bytes": shw,
                "shuffle_read_bytes": shr,
                "stages": len(new),
                "wall_s": round(wall, 3),
            }
            print(f"{name}: shw={shw} stages={len(new)}", file=sys.stderr)
        except Exception as ex:  # keep the series going
            rows[name] = {"error": str(ex)[:200]}
            print(f"{name}: ERROR {ex}", file=sys.stderr)

    payload.update(
        {
            "sf_dir": SF_DIR,
            "cpus": CPUS,
            "methodology": (
                "second-run stage deltas via AppStatusStore; "
                "noop sink; faces excluded"
            ),
        }
    )
    payload.setdefault("queries", {}).update(rows)
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)

    # markdown summary, largest shuffle volume first
    def key(item):
        return -item[1].get("shuffle_write_bytes", -1)

    print("| query | shuffle MB | stages | wall s |")
    print("|---|---|---|---|")
    for name, r in sorted(rows.items(), key=key):
        if "error" in r:
            print(f"| {name} | ERROR {r['error'][:60]} | | |")
            continue
        print(
            f"| {name} | {r['shuffle_write_bytes']/1e6:.2f} | "
            f"{r['stages']} | {r['wall_s']} |"
        )

    try:
        from flink_kafka_filter_transform_spark.operators.relational import (
            cleanup_layout_scratch,
        )
        from flink_kafka_filter_transform_spark.streaming.pipeline import (
            cleanup_face_scratch,
        )

        cleanup_layout_scratch(spark)
        cleanup_face_scratch(spark)
    except Exception:
        pass


if __name__ == "__main__":
    main()
