"""Log-rounds connected components (large-star/small-star) tests.

The round-2 verdict's item 7: propagation is diameter-bounded and RAISES on
long chains; the Kiveris alternating algorithm must close the same graphs in
O(log n) rounds.  Pinned here: agreement with propagation on random graphs,
the long-chain fixture propagation cannot do, and star/path/cycle shapes.
"""

from __future__ import annotations

import random

import pytest

from moira_spark.operators.components import (
    connected_components,
    connected_components_bigstar,
)


@pytest.fixture(autouse=True)
def _tiny_shuffle(spark):
    # Iterative algorithms pay per-round fixed costs per shuffle partition;
    # these graphs have <100 edges, so 2 partitions keeps rounds fast while
    # still exercising multi-partition merges.
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


def _labels(spark, edges, fn, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.id: r.comp for r in fn(df, **kw).collect()}
    spark.catalog.clearCache()
    return out


def _truth(edges):
    # union-find ground truth
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_bigstar_long_chain_where_propagation_raises(spark):
    # Path of diameter 30: propagation bounded at 8 rounds must raise
    # (honest failure, not truncation); big-star converges in O(log n)
    # rounds regardless of the diameter.
    chain = [(i, i + 1) for i in range(30)]
    random.Random(7).shuffle(chain)
    df = spark.createDataFrame(chain, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=8).collect()
    spark.catalog.clearCache()
    got = _labels(spark, chain, connected_components_bigstar)
    assert got == {i: 0 for i in range(31)}


@pytest.mark.parametrize("seed", [1, 2])
def test_bigstar_matches_union_find_on_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = 60
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(50)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = _labels(spark, edges, connected_components_bigstar)
    assert got == _truth(edges)


def test_bigstar_matches_propagation_on_dense_clusters(spark):
    # The dedup shape: dense planted clusters (propagation's home turf).
    clusters = [[1, 2, 3, 4], [10, 11, 12], [20, 21]]
    edges = [
        (a, b) for c in clusters for a in c for b in c if a < b
    ]
    prop = _labels(spark, edges, connected_components)
    star = _labels(spark, edges, connected_components_bigstar)
    assert prop == star == _truth(edges)


def test_bigstar_star_cycle_and_selfloop(spark):
    edges = (
        [(0, i) for i in range(1, 8)]  # star rooted at 0
        + [(100, 101), (101, 102), (102, 100)]  # 3-cycle
        + [(200, 200)]  # self-loop only: singleton
    )
    got = _labels(spark, edges, connected_components_bigstar)
    want = {i: 0 for i in range(8)}
    want.update({100: 100, 101: 100, 102: 100, 200: 200})
    assert got == want


def test_free_checkpoint_releases_blocks(spark):
    """The bounded-storage claim in _free_checkpoint's docstring, exercised:
    unpersisting via the LogicalRDD leaf must actually remove the
    checkpointed blocks from executor storage (the previous
    queryExecution().toRdd() approach no-op'd silently)."""
    import pyspark.sql.functions as F

    from moira_spark.operators.components import _free_checkpoint

    def cached_ids():
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return {i.id() for i in infos}

    before = cached_ids()
    df = (
        spark.range(0, 50_000)
        .withColumn("x", F.col("id") * 7)
        .localCheckpoint(eager=True)
    )
    after_ckpt = cached_ids()
    new_ids = after_ckpt - before
    assert new_ids, "localCheckpoint cached nothing? test premise broken"
    _free_checkpoint(df)
    after_free = cached_ids()
    assert not (new_ids & after_free), (
        f"checkpoint blocks {new_ids & after_free} still cached after "
        "_free_checkpoint"
    )
