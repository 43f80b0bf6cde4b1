"""Hot-cell bounding for the same-cell self-joins (knn_graph,
neardup_pairs, semantic_dedup).

Contracts pinned here:
- capped == uncapped whenever no cell exceeds the cap (the common case);
- salting (shards > 1) never changes the result set, only spreads work;
- a planted hot cell's candidate side is truncated to exactly `cap`
  deterministic representatives, so per-cell join work is |cell| x cap.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from carrot_transform_spark.operators import similarity as sim
from carrot_transform_spark.operators.semdedup import semantic_dedup

DIM = 8


def _corpus(spark, n=120, n_cells=6, hot_frac=0.0):
    """n vectors over n_cells; hot_frac of them forced into cell 0."""
    hot = int(n * hot_frac)
    cell = F.when(F.col("id") < hot, F.lit(0)).otherwise((F.col("id") % n_cells).cast("int"))
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        cell.alias("cell"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: ((F.col("id") % 13) + d * 2).cast("double") / 7.0,
        ).alias("embedding"),
    )


def _edges(df):
    return {(r["id"], r["neighbor_id"], r["rnk"]) for r in df.collect()}


def test_knn_capped_equals_uncapped_when_not_skewed(spark):
    c = _corpus(spark)  # max cell size 20 << cap 50
    base = _edges(sim.knn_graph(c, "cell", k=3))
    capped = _edges(sim.knn_graph(c, "cell", k=3, max_cell_size=50))
    assert capped == base


def test_knn_salting_is_result_invariant(spark):
    c = _corpus(spark, hot_frac=0.4)
    base = _edges(sim.knn_graph(c, "cell", k=3))
    salted = _edges(sim.knn_graph(c, "cell", k=3, shards=4))
    assert salted == base


def test_knn_hot_cell_candidates_truncated_to_cap(spark):
    c = _corpus(spark, n=200, hot_frac=0.5)
    hot_n = c.filter("cell = 0").count()  # 100 planted + the id%6==0 stragglers
    assert hot_n > 100
    cap = 20
    g = sim.knn_graph(c, "cell", k=500, max_cell_size=cap, shards=3)
    per_node = (
        g.join(c.select(F.col("vec_id").alias("id"), "cell"), "id")
        .filter(F.col("cell") == 0)
        .groupBy("id")
        .count()
        .collect()
    )
    # hot-cell nodes see at most cap candidates (cap-1 for capped nodes
    # whose own row is among the representatives), never the uncapped ~100
    assert per_node and all(r["count"] <= cap for r in per_node)
    # and every hot-cell node still gets edges
    assert len(per_node) == hot_n


def test_neardup_capped_equals_uncapped_when_not_skewed(spark):
    c = _corpus(spark)
    base = {(r["id_a"], r["id_b"]) for r in sim.neardup_pairs(c, "cell", threshold=0.5).collect()}
    capped = {
        (r["id_a"], r["id_b"])
        for r in sim.neardup_pairs(c, "cell", threshold=0.5, max_cell_size=50).collect()
    }
    assert capped == base


def test_semdedup_capped_equals_uncapped_when_not_skewed(spark):
    c = _corpus(spark)
    base = {(r["id"], r["component_id"], r["keep"]) for r in
            semantic_dedup(c, cell_col="cell", threshold=0.5).collect()}
    capped = {(r["id"], r["component_id"], r["keep"]) for r in
              semantic_dedup(c, cell_col="cell", threshold=0.5, max_cell_size=50).collect()}
    assert capped == base


def test_semdedup_capped_hot_cell_keeps_one_row_per_input(spark):
    c = _corpus(spark, n=200, hot_frac=0.5)
    out = semantic_dedup(c, cell_col="cell", threshold=0.5, max_cell_size=10)
    assert out.count() == 200
    # beyond-cap rows sit out pairing and survive as singleton keeps
    assert out.filter("keep = 1").count() >= out.count() - 200 + 1


def test_streaming_cell_pairs_cap_equals_uncapped_when_not_skewed(spark):
    """The incremental maintainer's batch-vs-store pair stage honors the
    same cap contract: identical pairs when no store cell exceeds it."""
    from carrot_transform_spark.operators.similarity import _normed, assign_cells
    from carrot_transform_spark.streaming.ann_index import _cell_pairs

    import pyspark.sql.functions as F

    def framed(df):
        cells = assign_cells(df, [[1.0] * DIM, [-1.0] * DIM]).withColumnRenamed("id", "__cid")
        return (
            _normed(df, "vec_id", "embedding")
            .join(cells, F.col("id") == F.col("__cid"))
            .drop("__cid")
        )

    old = framed(_corpus(spark, n=60))
    new = framed(
        _corpus(spark, n=30).withColumn("vec_id", F.col("vec_id") + 1000)
    )
    base = {(r["id_a"], r["id_b"]) for r in _cell_pairs(new, old, 0.5).collect()}
    capped = {
        (r["id_a"], r["id_b"])
        for r in _cell_pairs(new, old, 0.5, max_cell_size=100).collect()
    }
    assert capped == base and base


def test_auto_resolves_to_uncapped_on_healthy_layout(spark):
    """The knob-free default must be EXACTLY the uncapped/unsalted plan on
    an unskewed corpus (every cell far under floor/skew trigger)."""
    c = _corpus(spark)
    n = sim._normed(c, "vec_id", "embedding", ["cell"])
    assert sim._auto_cap(n, "cell") == (None, 1)
    auto = _edges(sim.knn_graph(c, "cell", k=3))  # defaults: "auto"/"auto"
    pinned = _edges(sim.knn_graph(c, "cell", k=3, max_cell_size=None, shards=1))
    assert auto == pinned


def test_auto_caps_planted_hot_cell(spark, monkeypatch):
    """With the floor scaled down to test size, a planted hot cell must
    trigger: cap lands near the top of the normal size distribution and
    shards reflect the over-representation factor; the default-call graph
    then bounds hot-cell candidates at the derived cap."""
    monkeypatch.setattr(sim, "_AUTO_CAP_FLOOR", 30)
    c = _corpus(spark, n=300, hot_frac=0.6)  # hot cell ~188, others ~20
    n = sim._normed(c, "vec_id", "embedding", ["cell"])
    cap, shards = sim._auto_cap(n, "cell")
    assert cap is not None and 30 <= cap < 150
    assert shards > 1
    g = sim.knn_graph(c, "cell", k=500)  # no knobs set
    per_node = (
        g.join(c.select(F.col("vec_id").alias("id"), "cell"), "id")
        .filter(F.col("cell") == 0)
        .groupBy("id")
        .count()
        .collect()
    )
    hot_n = c.filter("cell = 0").count()
    assert per_node and all(r["count"] <= cap for r in per_node)
    assert len(per_node) == hot_n  # every hot node still gets edges


def test_auto_in_neardup_and_semdedup_matches_pinned(spark):
    c = _corpus(spark)
    auto = {
        (r["id_a"], r["id_b"])
        for r in sim.neardup_pairs(c, "cell", threshold=0.5).collect()
    }
    pinned = {
        (r["id_a"], r["id_b"])
        for r in sim.neardup_pairs(c, "cell", threshold=0.5, max_cell_size=None).collect()
    }
    assert auto == pinned
    sd_auto = {
        (r["id"], r["component_id"], r["keep"])
        for r in semantic_dedup(c, cell_col="cell", threshold=0.5).collect()
    }
    sd_pinned = {
        (r["id"], r["component_id"], r["keep"])
        for r in semantic_dedup(
            c, cell_col="cell", threshold=0.5, max_cell_size=None
        ).collect()
    }
    assert sd_auto == sd_pinned
