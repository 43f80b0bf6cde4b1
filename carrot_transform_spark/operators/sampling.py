"""Deterministic stratified sampling and dataset mixing.

A 100 TB training-data pipeline needs sampling that is (a) deterministic —
the same corpus always yields the same subset, independent of partitioning,
task retries, or cluster size — and (b) stratified — per-language /
per-source rates to rebalance the mix. Spark's df.sample() is neither
(seeded per-partition), so we hash a stable key instead: keep a row iff
h32(key) % DENOM < rate * DENOM. The hash is the same md5-based 32-bit
hash used across the dedup/LSH operators, so any engine (and the DuckDB
oracle) reproduces the exact subset bit-for-bit.

This is a pure narrow projection+filter — no shuffle, fully pushed into
the scan stage, embarrassingly parallel at any scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from carrot_transform_spark.functions import sql_str

DENOM = 10_000


def _h32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Keep each row with probability rates[stratum], deterministically.

    The decision hash mixes the stratum into the key so re-using the same
    key column across two sampled columns doesn't correlate the subsets.
    """
    h = _h32(F.concat_ws("|", F.col(key_col).cast("string"), F.col(strata_col)))
    thresh = None
    for stratum, rate in rates.items():
        t = F.when(F.col(strata_col) == stratum, F.lit(int(rate * DENOM)))
        thresh = t if thresh is None else thresh.when(F.col(strata_col) == stratum, F.lit(int(rate * DENOM)))
    thresh = (
        thresh.otherwise(F.lit(int(default_rate * DENOM)))
        if thresh is not None
        else F.lit(int(default_rate * DENOM))
    )
    return df.filter((h % DENOM) < thresh)


def sample_threshold_sql(strata_expr: str, rates: dict[str, float], default_rate: float = 1.0) -> str:
    """DuckDB twin of the per-stratum threshold CASE."""
    whens = " ".join(
        f"WHEN {strata_expr} = {sql_str(s)} THEN {int(r * DENOM)}" for s, r in rates.items()
    )
    return f"CASE {whens} ELSE {int(default_rate * DENOM)} END"


def sample_hash_sql(key_expr: str, strata_expr: str) -> str:
    return (
        f"CAST(CONCAT('0x', substring(md5(concat_ws('|', CAST({key_expr} AS VARCHAR), "
        f"{strata_expr})), 1, 8)) AS UBIGINT) % {DENOM}"
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    split_col: str = "split",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in exactly
    one split by hash bucket, independent of partitioning or cluster size.

    splits: {name: fraction} summing to <= 1 (a shortfall from rounding goes
    to the LAST split, so every row is always assigned). Same md5 hash rule
    as stratified_sample; the salt decorrelates the split assignment from
    any sampling decisions made on the same key. Narrow projection — no
    shuffle, survives any scale.
    """
    if not splits:
        raise ValueError("hash_split needs at least one split")
    if any(f < 0 for f in splits.values()) or sum(splits.values()) > 1 + 1e-9:
        raise ValueError(f"hash_split fractions must be >= 0 and sum <= 1: {splits}")
    h = _h32(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(salt))) % DENOM
    names = list(splits)
    bounds: list[int] = []
    acc = 0
    for name in names[:-1]:
        acc += round(splits[name] * DENOM)
        bounds.append(acc)
    expr = None
    for name, b in zip(names[:-1], bounds):
        expr = F.when(h < b, name) if expr is None else expr.when(h < b, name)
    expr = expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1])
    return df.withColumn(split_col, expr)


def hash_split_sql(key_expr: str, splits: dict[str, float], salt: str = "split") -> str:
    """DuckDB twin of hash_split's assignment CASE."""
    h = (
        f"CAST(CONCAT('0x', substring(md5(concat_ws('|', CAST({key_expr} AS VARCHAR), "
        f"{sql_str(salt)})), 1, 8)) AS UBIGINT) % {DENOM}"
    )
    names = list(splits)
    whens, acc = [], 0
    for name in names[:-1]:
        acc += round(splits[name] * DENOM)
        whens.append(f"WHEN {h} < {acc} THEN {sql_str(name)}")
    if not whens:
        return sql_str(names[-1])
    return f"CASE {' '.join(whens)} ELSE {sql_str(names[-1])} END"


def curriculum_sample(
    df: DataFrame,
    score_col: str,
    key_col: str,
    n_buckets: int = 4,
    rates: list[float] | None = None,
    salt: str = "curr",
) -> DataFrame:
    """Quality-curriculum sampling: bucket rows by score quantile (bucket 1 =
    highest scores) and keep each row with its bucket's rate, deterministically.

    The bucket does NOT come from a global NTILE sort (a single-partition
    window over the whole corpus — the classic 100 TB bottleneck). Instead
    the SCORE HISTOGRAM is aggregated (map-side combine down to one row per
    distinct score — integer quality scores have bounded cardinality), the
    cumulative-start fraction runs over that tiny frame, and rows join back
    to their bucket through a broadcast. Ties share a bucket, so assignment
    is partitioning- and scale-independent. The keep decision is the same
    md5-hash rule as stratified_sample.

    rates[i] is bucket i+1's keep rate; default linearly decays from 1.0
    (best bucket keeps everything) to 1/n_buckets.
    """
    from pyspark.sql import Window

    if rates is None:
        rates = [1.0 - i / n_buckets for i in range(n_buckets)]
    if len(rates) != n_buckets:
        raise ValueError(f"need {n_buckets} rates, got {len(rates)}")
    hist = df.groupBy(score_col).agg(F.count(F.lit(1)).alias("__c"))
    w = Window.orderBy(F.desc(score_col)).rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    start = (F.sum("__c").over(w) - F.col("__c")).cast("double")
    total = F.sum("__c").over(tot).cast("double")
    bucketed = hist.select(
        score_col,
        F.least(
            F.lit(n_buckets), (F.floor(start * n_buckets / total) + 1).cast("int")
        ).alias("bucket"),
    )
    h = _h32(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(salt))) % DENOM
    thresh = None
    for i, r in enumerate(rates):
        t = DENOM if r >= 1.0 else round(r * DENOM)
        cond = F.col("bucket") == i + 1
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    return df.join(F.broadcast(bucketed), score_col).withColumn(
        "sampled", (h < thresh).cast("int")
    )


def curriculum_sample_sql(
    inner_sql: str,
    score_expr: str = "score",
    key_expr: str = "doc_id",
    n_buckets: int = 4,
    rates: list[float] | None = None,
    salt: str = "curr",
) -> str:
    """DuckDB twin of curriculum_sample over ``inner_sql`` rows."""
    if rates is None:
        rates = [1.0 - i / n_buckets for i in range(n_buckets)]
    h = (
        f"CAST(CONCAT('0x', substring(md5(concat_ws('|', CAST({key_expr} AS VARCHAR), "
        f"{sql_str(salt)})), 1, 8)) AS UBIGINT) % {DENOM}"
    )
    whens = " ".join(
        f"WHEN bucket = {i + 1} THEN {DENOM if r >= 1.0 else round(r * DENOM)}"
        for i, r in enumerate(rates)
    )
    return f"""
    WITH sig AS ({inner_sql}),
    hist AS (SELECT {score_expr} AS __s, COUNT(*) AS __c FROM sig GROUP BY {score_expr}),
    hb AS (
        SELECT __s, LEAST({n_buckets}, CAST(FLOOR(
            CAST(SUM(__c) OVER (ORDER BY __s DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - __c
                 AS DOUBLE) * {n_buckets}
            / (SELECT CAST(SUM(__c) AS DOUBLE) FROM hist)) AS INT) + 1) AS bucket
        FROM hist
    )
    SELECT sig.*, hb.bucket,
           CASE WHEN {h} < (CASE {whens} END) THEN 1 ELSE 0 END AS sampled
    FROM sig JOIN hb ON sig.{score_expr} = hb.__s
    """


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    salt: str = "wsample",
    flag_col: str = "sampled",
) -> DataFrame:
    """Per-row weighted Bernoulli sampling: keep each row with probability
    ``w / max_w``, deterministically.

    The continuous counterpart of curriculum_sample's quantile buckets —
    e.g. sample inversely proportional to duplicate-cluster size, or
    proportionally to a quality score, without bucketing first. Weights
    must be non-negative INTEGERS (scores, counts): the keep threshold is
    the exact integer ``(DENOM * w) div max_w``, so both engines (and any
    retry/partitioning) reproduce the identical subset — no float rates
    anywhere. max_w is a one-row aggregate joined back via broadcast; no
    driver action, no shuffle on the data path. Rows with the max weight
    are always kept (threshold == DENOM > any h % DENOM).
    """
    mx = df.agg(F.max(F.col(weight_col)).cast("long").alias("__max_w"))
    h = _h32(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(salt))) % DENOM
    return (
        df.crossJoin(F.broadcast(mx))
        .withColumn(flag_col, (h < F.expr(f"({weight_col} * {DENOM}L) div __max_w")).cast("int"))
        .drop("__max_w")
    )


def weighted_sample_sql(
    inner_sql: str,
    weight_expr: str = "weight",
    key_expr: str = "doc_id",
    salt: str = "wsample",
    flag_col: str = "sampled",
) -> str:
    """DuckDB twin of weighted_sample over ``inner_sql`` rows."""
    h = (
        f"CAST(CONCAT('0x', substring(md5(concat_ws('|', CAST({key_expr} AS VARCHAR), "
        f"{sql_str(salt)})), 1, 8)) AS UBIGINT) % {DENOM}"
    )
    return f"""
    WITH sig AS ({inner_sql}),
    mx AS (SELECT MAX({weight_expr}) AS __max_w FROM sig)
    SELECT sig.*, CASE WHEN {h} < (CAST({weight_expr} AS BIGINT) * {DENOM}) // __max_w
                  THEN 1 ELSE 0 END AS {flag_col}
    FROM sig CROSS JOIN mx
    """


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    salt: str = "cap",
    flag_col: str = "kept",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically.

    The "at most N documents per domain/source" curation step. Rows are
    ranked within their group by the md5 decision hash (key asc as the
    tiebreak — total order, no ties), and the first ``cap`` survive. One
    keyed shuffle + a partition-local window — the same shape as any
    per-group top-K, scale-safe under AQE skew splitting. The choice is a
    pure function of (key, salt): stable under retries, partitioning, and
    cluster size, and uncorrelated with any other sampling decision made
    on the same key (different salt -> different hash).
    """
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    h = _h32(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return df.withColumn(
        flag_col, (F.row_number().over(w) <= cap).cast("int")
    )


def cap_per_group_sql(
    inner_sql: str,
    group_expr: str,
    key_expr: str,
    cap: int,
    salt: str = "cap",
    flag_col: str = "kept",
) -> str:
    """DuckDB twin of cap_per_group over ``inner_sql`` rows."""
    h = (
        f"CAST(CONCAT('0x', substring(md5(concat_ws('|', CAST({key_expr} AS VARCHAR), "
        f"{sql_str(salt)})), 1, 8)) AS UBIGINT)"
    )
    return f"""
    WITH sig AS ({inner_sql})
    SELECT sig.*, CASE WHEN ROW_NUMBER() OVER (
        PARTITION BY {group_expr} ORDER BY {h}, {key_expr}
    ) <= {cap} THEN 1 ELSE 0 END AS {flag_col}
    FROM sig
    """


def sample_exact_n(
    df: DataFrame,
    key_col: str,
    n: int,
    salt: str = "exactn",
) -> DataFrame:
    """Keep EXACTLY min(n, |df|) rows, chosen deterministically.

    The "give me exactly 100k documents" curation shape — the fraction
    samplers (stratified/weighted) deliver a binomial count, not an exact
    one. Rows are ranked by the md5 decision hash (key asc tiebreak — total
    order, no ties) and the n smallest win; Catalyst executes the
    orderBy+limit as a distributed partial top-N (TakeOrderedAndProject:
    every partition keeps its own n best, one reducer merges the heads), so
    no global sort materializes at any corpus size. The n results must fit
    a single task — this is the exact-N shape for n up to a few million,
    not a "half the corpus" operator (use the fraction samplers there).

    Prefix-stable: the rank is a pure function of (key, salt), so
    sample_exact_n(df, m) is a SUBSET of sample_exact_n(df, n) for m <= n —
    growing a curated set never revokes earlier picks (pinned by test).
    """
    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    h = _h32(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(salt)))
    return (
        df.withColumn("__rk", h)
        .orderBy(F.col("__rk").asc(), F.col(key_col).asc())
        .limit(n)
        .drop("__rk")
    )


def sample_exact_n_sql(
    inner_sql: str,
    key_expr: str,
    n: int,
    salt: str = "exactn",
) -> str:
    """DuckDB twin of sample_exact_n over ``inner_sql`` rows."""
    h = (
        f"CAST(CONCAT('0x', substring(md5(concat_ws('|', CAST({key_expr} AS VARCHAR), "
        f"{sql_str(salt)})), 1, 8)) AS UBIGINT)"
    )
    return f"""
    SELECT * FROM ({inner_sql}) _exact
    ORDER BY {h}, {key_expr} LIMIT {n}
    """


def sample_exact_n_weighted(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    salt: str = "wexactn",
) -> DataFrame:
    """Exactly min(n, |df|) rows WITHOUT replacement, inclusion odds
    proportional to ``weight_col`` — Efraimidis-Spirakis A-ES: each row
    draws u = md5-uniform in (0,1) and ranks by u^(1/w); the n largest
    ranks are a weighted sample without replacement. Same distributed
    partial top-N execution as sample_exact_n (TakeOrderedAndProject — no
    global sort), deterministic for a given (key, salt), and prefix-stable
    in n.

    No DuckDB oracle twin: u^(1/w) goes through libm pow, whose last-ulp
    behavior differs across engines, so rank ORDER near ties is not
    cross-engine reproducible — the contracts are pinned Spark-side
    instead (exact count, determinism, partition invariance, and the
    weight-proportional inclusion law across independent salts). Rows with
    weight <= 0 are ineligible (a zero weight means "never sample") and
    are filtered before ranking, so the result is exactly
    min(n, |rows with w > 0|).
    """
    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    # u in (0,1): 32-bit md5 hash shifted off 0 (u=0 would pin rank 0 for
    # every weight; +0.5 centers each integer's mass away from both ends)
    h = _h32(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(salt)))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2**32))
    w = F.col(weight_col).cast("double")
    return (
        df.filter(w > 0)
        .withColumn("__wrk", F.pow(u, F.lit(1.0) / w))
        .orderBy(F.col("__wrk").desc(), F.col(key_col).asc())
        .limit(n)
        .drop("__wrk")
    )


def mix_datasets(
    parts: list[tuple["DataFrame", float]],
    key_col: str,
    source_names: list[str] | None = None,
) -> "DataFrame":
    """Deterministically mix datasets to target proportions.

    parts: [(df, target_weight), ...] — weights are the desired RELATIVE
    proportions of the output (they need not sum to 1). The mixer computes,
    per source, the largest keep-rate <= 1 that achieves the target mix
    with maximum data retention (the binding source keeps everything,
    over-represented sources downsample via the same deterministic hash
    rule as stratified_sample), then unions with a `mix_source` tag.

    Driver cost: one count() per part (metadata-scale). The sample itself
    is a narrow filter — no shuffle.
    """
    import pyspark.sql.functions as F

    if not parts:
        raise ValueError("mix_datasets needs at least one part")
    names = source_names or [f"src{i}" for i in range(len(parts))]
    counts = [df.count() for df, _ in parts]
    weights = [w for _, w in parts]
    # keep-rate r_i = c * w_i / n_i with c chosen so max r_i == 1. Empty or
    # zero-weight parts contribute no rows and must not bind c (an empty part
    # with positive weight would force c = 0 and silently empty the output).
    binding = [(n, w) for n, w in zip(counts, weights) if w > 0 and n > 0]
    if not binding:
        raise ValueError(
            "mix_datasets: every part has zero weight or zero rows — nothing to mix"
        )
    c = min(n / w for n, w in binding)
    out = None
    for (df, w), n, name in zip(parts, counts, names):
        rate = 0.0 if (w <= 0 or n == 0) else min(c * w / n, 1.0)
        # the binding source keeps EVERYTHING: rate==1.0 maps to the full
        # DENOM (h % DENOM < DENOM is always true); fractional rates round
        # rather than truncate, so float error can't shave off ~0.01% of a
        # source the math says to keep
        thresh = DENOM if rate >= 1.0 else round(rate * DENOM)
        h = _h32(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(name)))
        kept = df.filter((h % DENOM) < F.lit(thresh)).withColumn(
            "mix_source", F.lit(name)
        )
        out = kept if out is None else out.unionByName(kept)
    return out
