#!/usr/bin/env python
"""Local testdata generator for scale spot-checks (VERDICT r3 item 8).

Reproduces the driver's ten-table testdata layout (TESTDATA.md /
FIXTURES.md §B) at an arbitrary scale factor so the engine can be
stress-run at sf1 (10x the per-round bench's sf0.1) without touching
the read-only /root/testdata. Schemas are copied exactly from the
driver parquet (including events.ts as TIMESTAMP(us), the encoding the
driver ships as of r4); distributions mirror what
`tools/`-side inspection of sf0.1 measured:

  - documents: 31-token vocabulary, 10-100 tokens/doc, lang mix
    en 41% / es,de,fr,zh ~15%, 20 uniform sources, ~0.7% injected
    exact+near duplicates (sf0.1 has 8 exact-dup groups / 5000 docs)
  - embeddings: 64-dim unit-norm vectors around 10 label centroids
    (sf0.1 vectors are exactly unit norm, labels near-uniform)
  - events: 30 days of Jan-2024 microsecond timestamps, users =
    1.5% of events, value ~ Exp(mean 50) (sf0.1: median 34.8/p90 114),
    props = '{"k": <0..99>}'
  - TPC-H-ish tables: the same key ranges, category values and value
    ranges as sf0.1 (e.g. l_quantity 1..50, o_orderdate
    1995..2001-08, ~4.07 lineitems/order)

This is NOT the driver's generator (seed-compatible output is not a
goal — correctness gating stays on the driver's own sf0.01 data); it
exists to answer one question: does any operator go super-linear
between sf0.1 and sf1?

Usage: python tools/gen_testdata.py --sf 1 --out testdata_local/sf1
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "es", "de", "fr", "zh"]
LANG_P = [0.41, 0.15, 0.14, 0.15, 0.15]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
P_ADJ = ["large", "hot", "blue", "old", "cold", "red", "new", "small"]
P_NOUN = ["ring", "bolt", "plate", "chair", "table", "box", "case", "cap"]

DAY_US = 86_400_000_000


def _ts_us_array(us: np.ndarray) -> pa.Array:
    return pa.array(us.astype("int64"), type=pa.timestamp("us"))


def _write(out: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out, f"{name}.parquet")
    pq.write_table(table, path, row_group_size=1 << 20)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def gen(sf: float, out: str, vocab_mode: str = "default") -> None:
    """vocab_mode='zipf' (r8, VERDICT r7 item 5) swaps the documents
    table's 31-word vocabulary for a long-tail Zipfian one (10^4 terms,
    s=1.1) so selectivity-dependent operators (BM25's postings pruning,
    tf/df joins) can be measured under a realistic term distribution —
    the 31-word vocabulary gives every query term ~zero selectivity.
    Only the documents table differs; write zipf output to its own dir."""
    rng = np.random.default_rng(SEED)
    os.makedirs(out, exist_ok=True)

    n_customer = int(150_000 * sf)
    n_supplier = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = max(1, int(15_000 * sf))
    n_documents = int(50_000 * sf)
    n_embeddings = int(20_000 * sf)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    ck = np.arange(n_customer)
    _write(out, "customer", pa.table({
        "c_custkey": ck,
        "c_name": [f"Customer#{i:09d}" for i in ck],
        "c_nationkey": pa.array(rng.integers(0, 25, n_customer), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_customer), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_customer)],
    }))

    sk = np.arange(n_supplier)
    _write(out, "supplier", pa.table({
        "s_suppkey": sk,
        "s_name": [f"Supplier#{i:09d}" for i in sk],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supplier), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supplier), 2),
    }))

    pk = np.arange(n_part)
    adj = np.array(P_ADJ)[rng.integers(0, len(P_ADJ), n_part)]
    noun = np.array(P_NOUN)[rng.integers(0, len(P_NOUN), n_part)]
    _write(out, "part", pa.table({
        "p_partkey": pk,
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array([f"Brand#{i}" for i in range(1, 26)])[rng.integers(0, 25, n_part)],
        "p_type": np.array(P_TYPES)[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (pk % 1000) / 10.0, 2),
    }))

    ok = np.arange(n_orders)
    base_1995 = np.datetime64("1995-01-01").astype("datetime64[us]").astype("int64")
    odate_us = base_1995 + rng.integers(0, 2405, n_orders) * DAY_US
    _write(out, "orders", pa.table({
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, n_customer, n_orders),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_orders)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_orders), 2),
        "o_orderdate": _ts_us_array(odate_us),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_orders)],
    }))

    # lineitem: 1..7 lines per order (avg ~4, matching sf0.1's 4.075)
    nlines = rng.integers(1, 8, n_orders)
    l_orderkey = np.repeat(ok, nlines)
    n_li = len(l_orderkey)
    linenumber = np.concatenate([np.arange(1, k + 1) for k in nlines]) if n_li else np.array([], dtype="int64")
    ship_us = base_1995 + DAY_US + rng.integers(0, 2498, n_li) * DAY_US
    _write(out, "lineitem", pa.table({
        "l_orderkey": l_orderkey,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supplier, n_li),
        "l_linenumber": pa.array(linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _ts_us_array(ship_us),
    }))

    ev = np.arange(n_events)
    jan24 = np.datetime64("2024-01-01").astype("datetime64[us]").astype("int64")
    ts_us = jan24 + rng.integers(0, 30 * DAY_US, n_events)
    # ~1% NULL user_ids: several operators carry user_id-isNotNull
    # branches, and an audit corpus with zero nulls never charges that
    # path. (The driver's current generation happens to ship no nulls;
    # earlier ones did — keep the branch exercised either way.)
    user_id = pa.array(
        rng.integers(0, n_users, n_events),
        mask=rng.random(n_events) < 0.01,
    )
    _write(out, "events", pa.table({
        "event_id": ev,
        "ts": _ts_us_array(ts_us),
        "user_id": user_id,
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_events)],
        "value": np.round(rng.exponential(50.0, n_events), 2),
        "props": np.char.add(np.char.add('{"k": ', rng.integers(0, 100, n_events).astype("str")), "}"),
    }))

    # documents: random token sequences + ~0.7% injected duplicates
    lens = rng.integers(10, 101, n_documents)
    texts: list[str] = []
    if vocab_mode == "boiler":
        # r9 (VERDICT r8 item 3): boilerplate-heavy corpus for the
        # substring hot-key study — 30% of docs share ONE fixed ~160-
        # char header verbatim, so every stride-1 32-char window inside
        # it is corpus-hot (~0.3*N docs per window hash) — the gh-window
        # plan serializes each such hash's positions into one window
        # partition. The A/B (BENCH_substring_boiler.json) measured the
        # window plan 2-6x FASTER even here: at achievable corpus sizes
        # the hot partitions stay far below a task budget, while the
        # "skew-safe" rejoin pays a second full posexplode pass.
        header = "SYSTEM NOTICE all rights reserved duplicate of record retained for compliance archive under section 42 subsection 7 revision 9 effective immediately "
        vocab = np.array(VOCAB)
        boiler_mask = rng.random(n_documents) < 0.30
        for j, L in enumerate(lens):
            body = " ".join(vocab[rng.integers(0, len(vocab), L)])
            texts.append(header + body if boiler_mask[j] else body)
    elif vocab_mode == "zipf":
        V = 10_000
        vocab = np.array([f"w{i}" for i in range(V)])
        ranks = np.arange(1, V + 1, dtype="float64")
        p = ranks**-1.1
        p /= p.sum()
        all_toks = vocab[rng.choice(V, int(lens.sum()), p=p)]
        off = 0
        for L in lens:
            texts.append(" ".join(all_toks[off : off + L]))
            off += L
    else:
        vocab = np.array(VOCAB)
        for L in lens:
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), L)]))
    n_dup = max(1, n_documents // 150)
    dup_src = rng.integers(0, n_documents, n_dup)
    dup_dst = rng.integers(0, n_documents, n_dup)
    for s, d in zip(dup_src, dup_dst):
        if s == d:
            continue
        if rng.random() < 0.5:
            texts[d] = texts[s]  # exact duplicate
        else:  # near duplicate: perturb one token
            toks = texts[s].split(" ")
            toks[rng.integers(0, len(toks))] = vocab[rng.integers(0, len(vocab))]
            texts[d] = " ".join(toks)
    _write(out, "documents", pa.table({
        "doc_id": np.arange(n_documents),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_documents, p=LANG_P)],
        "source": np.array([f"src{i}" for i in range(20)])[rng.integers(0, 20, n_documents)],
        "n_chars": np.array([len(t) for t in texts], dtype="int64"),
    }))

    # embeddings: unit-norm vectors around 10 label centroids
    dim = 64
    centroids = rng.normal(0, 1, (10, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_embeddings)
    vecs = centroids[labels] + rng.normal(0, 0.35, (n_embeddings, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_embeddings),
        "embedding": pa.array(list(vecs.astype("float32")), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--vocab", choices=["default", "zipf", "boiler"], default="default")
    args = ap.parse_args()
    suffix = "" if args.vocab == "default" else f"_{args.vocab}"
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_local",
        f"sf{args.sf:g}{suffix}",
    )
    print(f"generating sf={args.sf} vocab={args.vocab} -> {out}")
    gen(args.sf, out, vocab_mode=args.vocab)


if __name__ == "__main__":
    main()
