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
