"""Connected-components unit tests: convergence on shapes that need
multiple propagation rounds (parity test covers the real-data path)."""

from flink_kafka_filter_transform_spark.operators.graph import connected_components


def test_chain_converges_to_single_component(spark):
    """A 10-vertex path graph needs several label hops to converge."""
    verts = spark.createDataFrame([(i,) for i in range(10)], "id BIGINT")
    edges = spark.createDataFrame([(i, i + 1) for i in range(9)], "src BIGINT, dst BIGINT")
    got = {(r.id, r.component) for r in connected_components(verts, edges).collect()}
    assert got == {(i, 0) for i in range(10)}


def test_disconnected_components_and_singletons(spark):
    verts = spark.createDataFrame([(i,) for i in range(7)], "id BIGINT")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "src BIGINT, dst BIGINT"
    )
    got = {(r.id, r.component) for r in connected_components(verts, edges).collect()}
    assert got == {(0, 0), (1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)}


def test_connected_components_edges_computed_once_not_per_iteration(spark):
    """The CC loop must materialize the symmetrized edge list before
    iterating — without that, every label hop re-derives the edges'
    FULL upstream lineage (for neardup_clusters: the whole MinHash
    shingle->band->verify pipeline per round; measured 3x on
    dedup_survivors_quality at sf1). An accumulator on the edge RDD
    counts lineage executions: a 10-vertex chain needs ~9 propagation
    rounds, so an unmaterialized loop would bump it per round, while
    the persisted loop pays only the one materialization job (<= 2
    union branches x 2 partitions). The cache must also be RELEASED on
    both exit paths (checkpointed labels decouple consumers from it)."""
    # patch the CONCRETE class (pyspark 4: instances are
    # classic.dataframe.DataFrame; the pyspark.sql.DataFrame base's
    # methods are overridden and never hit)
    from pyspark.sql.classic.dataframe import DataFrame as _DF

    from flink_kafka_filter_transform_spark.operators import graph

    acc = spark.sparkContext.accumulator(0)

    def counted(it):
        acc.add(1)
        return it

    edge_rdd = spark.sparkContext.parallelize(
        [(i, i + 1) for i in range(9)], 2
    ).mapPartitions(counted)
    edges = spark.createDataFrame(edge_rdd, "src BIGINT, dst BIGINT")
    verts = spark.createDataFrame([(i,) for i in range(10)], "id BIGINT")

    persists, unpersists = [], []
    orig_p, orig_u = _DF.persist, _DF.unpersist
    orig_cap = graph.SMALL_GRAPH_EDGE_CAP
    try:
        # force the DISTRIBUTED fixpoint (this test pins the LOOP's
        # materialization discipline; the r15 union-find fast path is
        # covered separately below and in the fastpath tests)
        graph.SMALL_GRAPH_EDGE_CAP = 0
        _DF.persist = lambda self, *a: persists.append(1) or orig_p(self, *a)
        _DF.unpersist = lambda self, *a: unpersists.append(1) or orig_u(self, *a)
        result = graph.connected_components(verts, edges)
    finally:
        graph.SMALL_GRAPH_EDGE_CAP = orig_cap
        _DF.persist, _DF.unpersist = orig_p, orig_u
    got = {(r.id, r.component) for r in result.collect()}
    assert got == {(i, 0) for i in range(10)}
    # lineage ran only in the materialization job, never per iteration
    assert 0 < acc.value <= 4
    # release discipline: every loop persist released before returning
    assert len(persists) >= 1 and len(unpersists) == len(persists)
    # the returned labels survive the release (checkpoint decoupling)
    assert result.count() == 10

    # the non-convergence raise path releases too
    import pytest as _pytest

    try:
        graph.SMALL_GRAPH_EDGE_CAP = 0
        _DF.persist = lambda self, *a: persists.append(1) or orig_p(self, *a)
        _DF.unpersist = lambda self, *a: unpersists.append(1) or orig_u(self, *a)
        with _pytest.raises(RuntimeError):
            graph.connected_components(verts, edges, max_iter=1)
    finally:
        graph.SMALL_GRAPH_EDGE_CAP = orig_cap
        _DF.persist, _DF.unpersist = orig_p, orig_u
    assert len(unpersists) == len(persists)

    # the r15 fast path releases its probe cache too (one persist for
    # the restricted edge relation, released before returning)
    persists.clear(); unpersists.clear()
    try:
        _DF.persist = lambda self, *a: persists.append(1) or orig_p(self, *a)
        _DF.unpersist = lambda self, *a: unpersists.append(1) or orig_u(self, *a)
        fast = graph.connected_components(verts, edges)
        got_fast = {(r.id, r.component) for r in fast.collect()}
    finally:
        _DF.persist, _DF.unpersist = orig_p, orig_u
    assert got_fast == got
    assert len(persists) >= 1 and len(unpersists) == len(persists)


def test_pagerank_star_graph_center_dominates(spark):
    """On a 5-leaf undirected star, the hub must out-rank every leaf,
    leaves must tie exactly (integer arithmetic — EXACT equality), and
    total mass must stay under PR_SCALE (floor leaks only)."""
    from flink_kafka_filter_transform_spark.operators.graph import (
        PR_SCALE,
        pagerank,
    )

    leaves = list(range(1, 6))
    e = [(0, i) for i in leaves] + [(i, 0) for i in leaves]
    verts = spark.createDataFrame([(i,) for i in range(6)], "node_id BIGINT")
    edges = spark.createDataFrame(e, "src BIGINT, dst BIGINT")
    ranks = {r.node_id: r.rank_scaled for r in pagerank(verts, edges).collect()}
    assert ranks[0] > ranks[1]
    assert len({ranks[i] for i in leaves}) == 1  # exact integer tie
    assert sum(ranks.values()) <= PR_SCALE


def test_pagerank_uniform_on_regular_graph(spark):
    """On a 4-cycle (2-regular), PageRank is exactly uniform at every
    iteration: all nodes keep the identical integer rank."""
    from flink_kafka_filter_transform_spark.operators.graph import pagerank

    e = [(i, (i + 1) % 4) for i in range(4)] + [((i + 1) % 4, i) for i in range(4)]
    verts = spark.createDataFrame([(i,) for i in range(4)], "node_id BIGINT")
    edges = spark.createDataFrame(e, "src BIGINT, dst BIGINT")
    got = {r.rank_scaled for r in pagerank(verts, edges).collect()}
    assert len(got) == 1


def test_pagerank_rejects_empty_graph(spark):
    from flink_kafka_filter_transform_spark.operators.graph import pagerank
    import pytest as _pytest

    verts = spark.createDataFrame([], "node_id BIGINT")
    edges = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    with _pytest.raises(ValueError):
        pagerank(verts, edges)


def test_unionfind_small_matches_distributed_components(spark):
    """The r14 driver-side fast path must compute EXACTLY what the
    distributed min-label fixpoint computes over the same edge set —
    per endpoint node, component = min node id — on a graph mixing
    chains, a clique, self-loops, duplicate and reversed edges."""
    import random

    from flink_kafka_filter_transform_spark.operators.graph import (
        components_unionfind_small,
        connected_components,
    )

    rng = random.Random(14)
    edges = (
        [(i, i + 1) for i in range(0, 8)]          # chain 0..8
        [:] + [(a, b) for a in (20, 21, 22, 23) for b in (20, 21, 22, 23) if a < b]
        + [(30, 30), (41, 40), (40, 41), (50, 51), (50, 51)]
        + [(rng.randrange(60, 90), rng.randrange(60, 90)) for _ in range(40)]
    )
    e = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    small = components_unionfind_small(e)
    assert small is not None
    verts = (
        e.selectExpr("src AS id")
        .unionAll(e.selectExpr("dst AS id"))
        .distinct()
    )
    # pin the DISTRIBUTED fixpoint as the reference (r15: the public
    # entry itself takes the union-find path below the cap, which
    # would make this comparison a tautology)
    from flink_kafka_filter_transform_spark.operators import graph as _g

    orig_cap = _g.SMALL_GRAPH_EDGE_CAP
    try:
        _g.SMALL_GRAPH_EDGE_CAP = 0
        want = {
            (r.id, r.component)
            for r in connected_components(verts, e).collect()
        }
    finally:
        _g.SMALL_GRAPH_EDGE_CAP = orig_cap
    assert set(small) == want
    # and the public fast path agrees with both
    got_fast = {
        (r.id, r.component) for r in connected_components(verts, e).collect()
    }
    assert got_fast == want


def test_cc_fastpath_ignores_nonvertex_endpoints(spark):
    """The r14-mapped semantic trap, property-pinned: the distributed
    loop computes components of the VERTEX-INDUCED subgraph, so two
    vertices bridged only THROUGH a non-vertex endpoint stay in
    SEPARATE components — the r15 union-find fast path must pre-
    restrict the edge set and agree, never connect through the
    non-vertex node. Graph: vertices {1,2,3,4}; edges 1-9-2 (9 is NOT
    a vertex: must not merge 1 and 2), 3-4 (both vertices: merges),
    plus a dangling 7-8 entirely outside the vertex set."""
    from flink_kafka_filter_transform_spark.operators import graph

    verts = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "id BIGINT")
    edges = spark.createDataFrame(
        [(1, 9), (9, 2), (3, 4), (7, 8)], "src BIGINT, dst BIGINT"
    )
    want = {(1, 1), (2, 2), (3, 3), (4, 3)}
    # fast path (default cap — 4 edges take the union-find)
    got_fast = {
        (r.id, r.component)
        for r in graph.connected_components(verts, edges).collect()
    }
    assert got_fast == want
    # distributed reference agrees
    orig_cap = graph.SMALL_GRAPH_EDGE_CAP
    try:
        graph.SMALL_GRAPH_EDGE_CAP = 0
        got_dist = {
            (r.id, r.component)
            for r in graph.connected_components(verts, edges).collect()
        }
    finally:
        graph.SMALL_GRAPH_EDGE_CAP = orig_cap
    assert got_dist == want


def test_unionfind_small_respects_edge_cap(spark):
    from flink_kafka_filter_transform_spark.operators.graph import (
        components_unionfind_small,
    )

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src BIGINT, dst BIGINT"
    )
    assert components_unionfind_small(e, edge_cap=5) is None
    assert components_unionfind_small(e, edge_cap=10) is not None
