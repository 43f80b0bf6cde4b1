"""Plan-shape contracts for the headline queries — the 100 TB posture as
executable assertions instead of one-off .explain() audits.

Each test pins a property the PLANS.md audit established: filters reaching
the parquet scan (PushedFilters), column pruning (ReadSchema), broadcast
joins where a side is known-small, and the absence of cartesian products in
candidate generation. A regression that silently turns a broadcast into a
full shuffle, or drops a pushdown, fails here instead of only showing up as
a slower bench number.
"""

from __future__ import annotations

import re

from carrot_transform_spark.queries import all_queries


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_lines(plan: str) -> list[str]:
    return [l for l in plan.splitlines() if "FileScan parquet" in l or "Scan parquet" in l]


def test_q1_pushdown_and_pruning(spark, sf_dir):
    df = all_queries()["q1_pricing_summary"].spark_fn(spark, sf_dir)
    plan = _executed_plan(df)
    scans = _scan_lines(plan)
    assert scans, "q1 must read parquet directly"
    lineitem = next(s for s in scans if "lineitem" in s)
    # the shipdate predicate must reach the scan
    assert "PushedFilters" in lineitem and "l_shipdate" in lineitem.split("PushedFilters")[1]
    # column pruning: the 7 referenced columns, nothing more (the scan's
    # output list; ReadSchema gets truncated in plan toString)
    m = re.search(r"FileScan parquet \[([^\]]*)\]", lineitem)
    assert m is not None
    cols = {c.split("#")[0].strip() for c in m.group(1).split(",") if c}
    assert cols <= {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }, f"q1 scan reads unexpected columns: {cols}"


def test_q3_broadcasts_customer(spark, sf_dir):
    df = all_queries()["q3_shipping_priority"].spark_fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_maybe_broadcast_honours_disabled_threshold(spark, sf_dir):
    # autoBroadcastJoinThreshold=-1 is Spark's DISABLE sentinel (sessions
    # force sort-merge joins that way at scale) — maybe_broadcast must
    # return the frame un-hinted, not treat it as 'unlimited'
    from carrot_transform_spark.queries import load, maybe_broadcast

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = load(spark, sf_dir, "nation")
        hinted = maybe_broadcast(df)
        assert "UnresolvedHint" not in hinted._jdf.queryExecution().logical().toString()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        hinted2 = maybe_broadcast(df)
        assert "UnresolvedHint" in hinted2._jdf.queryExecution().logical().toString() or             "ResolvedHint" in hinted2._jdf.queryExecution().analyzed().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_omop_observation_broadcasts_person_map(spark, sf_dir):
    # fresh memo key per sf_dir; the person-map join must be broadcast and
    # nothing in the ETL plan may fall back to a cartesian product
    df = all_queries()["omop_observation_events"].spark_fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_minhash_no_cartesian(spark, sf_dir):
    """Candidate generation must stay a banded equi-join — an accidental
    doc-by-doc comparison shows up as CartesianProduct/BroadcastNestedLoop."""
    df = all_queries()["dd_minhash_lsh_pairs"].spark_fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_topk_corpus_side_not_shuffled_for_join(spark, sf_dir):
    """Brute-force top-k broadcasts the (tiny) query side; the corpus scan
    must not pay a join shuffle."""
    df = all_queries()["sim_topk_bruteforce"].spark_fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan


def test_sessionize_single_keyed_exchange(spark, sf_dir):
    """Sessionization is one user-keyed window pipeline: the executed plan
    must not shuffle the events more than the keyed exchanges it declares
    (regression guard against an accidental global sort)."""
    df = all_queries()["ev_sessionize"].spark_fn(spark, sf_dir)
    plan = _executed_plan(df)
    # a global Sort outside a window (Exchange SinglePartition) would be a
    # scale bug; rangepartitioning only appears for the final oracle ORDER BY
    assert "Exchange SinglePartition" not in plan or "AdaptiveSparkPlan" in plan


def test_weighted_sample_no_data_shuffle(spark):
    """weighted_sample's data path is a narrow filter: the only exchange in
    the plan is the 1-row max-weight broadcast — no hash/range exchange of
    the data ever happens."""
    from carrot_transform_spark.operators.sampling import weighted_sample

    df = spark.range(0, 10_000).selectExpr("id", "CAST(id % 7 + 1 AS INT) AS w")
    plan = _executed_plan(weighted_sample(df, "w", "id"))
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    # allowed: the broadcast itself and the SinglePartition exchange that
    # finalizes the 1-row max aggregate (carries <= n_partitions partial
    # rows, not data). Disallowed: any hash/range partitioning of the data.
    for line in plan.splitlines():
        if ("Exchange hashpartitioning" in line) or ("Exchange rangepartitioning" in line):
            raise AssertionError(f"unexpected data shuffle: {line}")


def test_zorder_repartition_single_range_exchange(spark):
    """zorder_repartition = broadcast min/max + narrow bit-interleave +
    ONE range exchange (the shuffle any global clustering needs)."""
    from carrot_transform_spark.operators.layout import zorder_repartition

    df = spark.range(0, 4_096).selectExpr(
        "CAST(id % 64 AS INT) AS x", "CAST(id DIV 64 AS INT) AS y"
    )
    plan = _executed_plan(zorder_repartition(df, ["x", "y"], num_partitions=16, bits=6))
    ranges = [l for l in plan.splitlines() if "Exchange rangepartitioning" in l]
    assert len(ranges) == 1, plan
    # no hash exchange of the data anywhere; the SinglePartition exchange
    # finalizing the 1-row min/max aggregate is metadata-sized and allowed
    assert "Exchange hashpartitioning" not in plan, plan
    assert "pythonudf" not in plan.lower()  # pure bitwise expression tree


def test_skew_profile_takeordered_not_global_sort(spark):
    """skew_profile's top-K is TakeOrdered (per-partition top-K + K-row
    merge); the only keyed exchange is the per-key count aggregation."""
    from carrot_transform_spark.operators.diagnostics import skew_profile

    df = spark.range(0, 20_000).selectExpr("CAST(id % 500 AS INT) AS k", "id AS v")
    out = skew_profile(df, "k", top_k=10)
    out.collect()  # finalize the AQE plan so exchange reuse is visible
    plan = _executed_plan(out)
    assert "TakeOrderedAndProject" in plan, plan
    # the totals branch and the top-K branch share ONE per-key count
    # shuffle at runtime: AQE replaces the duplicate with a ReusedExchange
    assert "ReusedExchange" in plan or "ReusedQueryStage" in plan, plan


def test_knn_graph_equijoin_not_cartesian(spark, sf_dir):
    """The k-NN graph's candidate stage must be an equi-join on the cell
    (shuffle- or broadcast-hash), never a cartesian/BNL product of the
    corpus with itself."""
    from carrot_transform_spark.operators.similarity import knn_graph

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _executed_plan(knn_graph(e, "label", k=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_verify_narrows_store_read(spark, sf_dir, tmp_path, monkeypatch):
    """update_minhash_index must hand jaccard_verify a CHECKPOINTED
    candidate-narrowed index, not the raw store: the raw-store verify plan
    scans the shingles dataset twice per step (both pair sides) — O(corpus)
    IO that erased the incremental advantage by ~1.6M docs (BASELINE.md
    row). Pinned by capturing the index frame the verify actually receives
    and asserting its plan contains no store scan."""
    import pyspark.sql.functions as F

    from carrot_transform_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "mh_index")
    dd.save_minhash_index(*dd.minhash_index_frames(base, "doc_id", "text"), path)

    seen = []
    real_verify = dd.jaccard_verify

    def capture(pairs, index, threshold=0.7):
        seen.append(index)
        return real_verify(pairs, index, threshold=threshold)

    monkeypatch.setattr(dd, "jaccard_verify", capture)
    pairs = dd.update_minhash_index(path, batch, "doc_id", "text")
    assert pairs.count() > 0
    assert len(seen) == 1
    # the only file scan allowed in the verify's index input is the batch's
    # own documents read; the store side must arrive checkpointed (scanned
    # once, upstream, already narrowed to candidate ids)
    store_scans = [s for s in _scan_lines(_executed_plan(seen[0])) if path in s]
    assert not store_scans, (
        "verify received the raw store — candidate narrowing lost:\n"
        + "\n".join(store_scans)
    )
