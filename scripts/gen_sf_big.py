#!/usr/bin/env python
"""Scale the driver-generated testdata up by an integer factor for scale
proofs (VERDICT r8 task 1: run the full oracle sweep + bench at sf1).

Replicates each fact table FACTOR times with disjoint key ranges (replica
r shifts every key by r * 10_000_000), keeping referential integrity
WITHIN a replica — each replica is an independent shard of the economy,
so joins never cross replicas and aggregates scale linearly. Replica 0 is
byte-identical to the source tables (the original sf is a subset of the
scaled sf). Dimension tables (region, nation) are shared.

Determinism: every perturbation is a pure function of (key, replica):
 - monetary/double columns get a +r*epsilon nudge so cross-replica
   aggregate ties (which would make top-k LIMIT nondeterministic between
   engines) cannot occur;
 - document text maps token t -> t~r for r > 0: within-replica dup/near-dup
   structure is preserved exactly, while cross-replica token spaces are
   disjoint (no 10x duplicate-group blowup for the dedup operators);
 - embeddings get hash-derived per-component jitter large enough to stay
   below near-dup thresholds across replicas.

Usage: python scripts/gen_sf_big.py [src_dir] [out_dir] [factor]
  default: /root/testdata/sf0.1 /root/repo/data/sf1 10
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

OFF = 10_000_000

# At/above this factor the replicated fact tables are too big to funnel
# through the single-file writer (factor 1000 = ~600M lineitem rows, a
# ~30 GB shuffle + one 15 GB writer task).  Instead: put the replica ids on
# the LEFT, partitioned by replica, and BROADCAST the small sf0.1 source
# table — every task generates the full rows for its replica slice locally
# (no shuffle of replicated data at all) and writes its own part file.
# Output becomes a DIRECTORY named <t>.parquet/ (Spark reads it natively;
# tests/oracle_compare.duck_connect globs it for DuckDB).
BIG_FACTOR = 100
BIG_TASKS = 96


def _rep(spark: SparkSession, df: DataFrame, factor: int) -> DataFrame:
    """Cross-join with replica ids 0..factor-1 (column __r)."""
    reps = spark.range(factor).select(F.col("id").cast("int").alias("__r"))
    if factor >= BIG_FACTOR:
        reps = reps.repartition(BIG_TASKS, "__r")
        return reps.crossJoin(F.broadcast(df))
    return df.crossJoin(reps)


def _shift(col: str) -> F.Column:
    return (F.col(col) + F.col("__r").cast("long") * OFF).alias(col)


def _nudge(col: str, eps: float) -> F.Column:
    return (F.col(col) + F.col("__r") * F.lit(eps)).alias(col)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/data/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import os

    cpus = os.environ.get("GEN_CPUS", "16")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("GEN_DRIVER_MEM", "16g"))
        .appName("gen_sf_big")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    Path(out).mkdir(parents=True, exist_ok=True)

    def rd(t: str) -> DataFrame:
        return spark.read.parquet(f"{src}/{t}.parquet")

    def wr(df: DataFrame, t: str, parts: int) -> None:
        # single .parquet FILE per table (DuckDB reads it directly, matching
        # the driver's testdata layout): parallel compute up to the shuffle,
        # one writer task after it
        import glob
        import shutil

        t0 = time.time()
        if factor >= BIG_FACTOR:
            # replica-partitioned generation writes BIG_TASKS part files in
            # parallel into a directory named <t>.parquet
            dest = f"{out}/{t}.parquet"
            if Path(dest).is_file():
                Path(dest).unlink()
            df.write.mode("overwrite").parquet(dest)
            n = spark.read.parquet(dest).count()
            print(f"{t}: {n} rows in {time.time() - t0:.1f}s -> {dest}/ (dir)", flush=True)
            return
        tmp = f"{out}/__{t}"
        df.repartition(parts).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, f"{out}/{t}.parquet")
        shutil.rmtree(tmp)
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows in {time.time() - t0:.1f}s -> {out}/{t}.parquet", flush=True)

    for t in ("region", "nation"):
        rd(t).coalesce(1).write.mode("overwrite").parquet(f"{out}/__{t}")
        import glob
        import shutil

        part = glob.glob(f"{out}/__{t}/part-*.parquet")[0]
        shutil.move(part, f"{out}/{t}.parquet")
        shutil.rmtree(f"{out}/__{t}")
        print(f"{t}: copied", flush=True)

    wr(
        _rep(spark, rd("customer"), factor).select(
            _shift("c_custkey"), "c_name", "c_nationkey", _nudge("c_acctbal", 0.01), "c_mktsegment"
        ),
        "customer",
        4,
    )
    wr(
        _rep(spark, rd("supplier"), factor).select(
            _shift("s_suppkey"), "s_name", "s_nationkey", _nudge("s_acctbal", 0.01)
        ),
        "supplier",
        1,
    )
    wr(
        _rep(spark, rd("part"), factor).select(
            _shift("p_partkey"), "p_name", "p_brand", "p_type", "p_size",
            _nudge("p_retailprice", 0.01),
        ),
        "part",
        2,
    )
    wr(
        _rep(spark, rd("orders"), factor).select(
            _shift("o_orderkey"), _shift("o_custkey"), "o_orderstatus",
            _nudge("o_totalprice", 0.01), "o_orderdate", "o_orderpriority",
        ),
        "orders",
        8,
    )
    wr(
        _rep(spark, rd("lineitem"), factor).select(
            _shift("l_orderkey"), _shift("l_partkey"), _shift("l_suppkey"),
            "l_linenumber", "l_quantity", _nudge("l_extendedprice", 0.01),
            "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        ),
        "lineitem",
        16,
    )
    wr(
        _rep(spark, rd("events"), factor).select(
            _shift("event_id"), "ts", _shift("user_id"), "event_type",
            _nudge("value", 0.001), "props",
        ),
        "events",
        8,
    )
    # token t -> t~<r> for r>0: disjoint cross-replica token spaces, exact
    # within-replica dup structure
    docs = (
        _rep(spark, rd("documents"), factor)
        .select(
            _shift("doc_id"),
            F.when(F.col("__r") == 0, F.col("text"))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda t: F.concat(t, F.lit("~"), F.col("__r").cast("string")),
                    ),
                )
            )
            .alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    wr(docs, "documents", 8)

    emb = _rep(spark, rd("embeddings"), factor).select(
        _shift("vec_id"),
        F.when(F.col("__r") == 0, F.col("embedding"))
        .otherwise(
            F.transform(
                F.col("embedding"),
                lambda x, i: (
                    x.cast("double")
                    + (
                        F.pmod(F.xxhash64(F.col("vec_id"), F.col("__r"), i), F.lit(2001)) - 1000
                    ).cast("double")
                    / 2000.0
                ).cast("float"),
            )
        )
        .alias("embedding"),
        "label",
    )
    wr(emb, "embeddings", 2)

    spark.stop()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
