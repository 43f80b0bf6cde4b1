"""Similarity search over the embeddings table (array<float> column).

- brute-force cosine top-k: the correctness baseline. Dot products are
  computed JVM-side with zip_with + aggregate (no Python), in double
  precision so the DuckDB oracle (explicit double math, NOT DuckDB's
  float32 list_cosine_similarity) matches to 1e-12.
- IVF-style partitioned top-k: the scale path — restrict candidate pairs to
  a coarse cell (here the label column stands in for the nearest-centroid
  assignment an IVF index would produce; at 100 TB cells are built with
  k-means and the probe fans out to n_probe cells).
- threshold near-dup pairs: embedding-cosine dedup.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from carrot_transform_spark.functions.rounding import fround, fround_sql
from carrot_transform_spark.queries import load, register

_DOT_SQL = "list_sum(list_transform(list_zip({a}, {b}), s -> s[1] * s[2]))"

# The blocking/quantization DEMO checks use O(1) cells (3 literal
# centroids / the label column), so their pair volume is quadratic in the
# corpus; at super-bench scale factors that is hours of oracle time for a
# semantics check. Every embeddings-based demo query therefore runs on the
# first _EMB_BOUND vectors — at the driver gate scales (sf0.01/sf0.1 the
# whole table is smaller than the bound, so this is a no-op) — while the
# SCALE proofs for this family are the dedicated stress scripts
# (scripts/hotcell_stress.py, ann_stress.py: 10^6 vectors, 4096 cells).
_EMB_BOUND = 4000


def _to_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings DEMO slice (vec_id < _EMB_BOUND, see note above)."""
    return load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _EMB_BOUND)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


_NORMED_SQL = f"""
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings WHERE vec_id < {_EMB_BOUND}
"""


# the brute/IVF oracle bodies are module constants so composed checks
# (sim_ann_recall in pipeline_ops) can reuse them verbatim
BRUTE_TOPK_SQL = f"""
    WITH n AS ({_NORMED_SQL}),
    q AS (SELECT * FROM n WHERE vec_id < 8),
    scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               {_DOT_SQL.format(a='q.v', b='n.v')} / (q.nrm * n.nrm) AS cs
        FROM q JOIN n ON n.vec_id <> q.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cs,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, {fround_sql("cs")} AS cosine_sim, rnk
    FROM ranked WHERE rnk <= 5
    """


@register(
    "sim_topk_bruteforce",
    oracle=BRUTE_TOPK_SQL + " ORDER BY query_id, rnk",
    tags=("similarity", "ann", "bench"),
    prepared=True,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 8 query vectors. Query side is tiny ->
    broadcast; the corpus scan is embarrassingly parallel; per-query ranking
    is a windowed top-k (at scale: aggregate partial top-k per partition
    before the final window)."""
    e = _emb(spark, sf_dir)
    n = e.select("vec_id", _to_double("embedding").alias("v")).withColumn(
        "nrm", _norm(F.col("v"))
    )
    q = n.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    scored = (
        n.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias("cs"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", fround("cs").alias("cosine_sim"), "rnk")
        .orderBy("query_id", "rnk")
    )


IVF_TOPK_SQL = f"""
    WITH n AS ({_NORMED_SQL}),
    q AS (SELECT * FROM n WHERE vec_id < 8),
    scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               {_DOT_SQL.format(a='q.v', b='n.v')} / (q.nrm * n.nrm) AS cs
        FROM q JOIN n ON n.label = q.label AND n.vec_id <> q.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cs,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, {fround_sql("cs")} AS cosine_sim, rnk
    FROM ranked WHERE rnk <= 5
    """


@register(
    "sim_ivf_topk",
    oracle=IVF_TOPK_SQL + " ORDER BY query_id, rnk",
    tags=("similarity", "ann", "ivf"),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN: candidates restricted to the query's coarse cell
    (label = nearest-centroid id). Turns the all-pairs scan into a
    cell-local equi-join — the 100 TB layout partitions the corpus by cell
    so each probe touches n_probe partitions."""
    e = _emb(spark, sf_dir)
    n = e.select("vec_id", "label", _to_double("embedding").alias("v")).withColumn(
        "nrm", _norm(F.col("v"))
    )
    q = n.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        n.join(
            F.broadcast(q),
            (F.col("label") == F.col("qlabel")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias("cs"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", fround("cs").alias("cosine_sim"), "rnk")
        .orderBy("query_id", "rnk")
    )


NEARDUP_SQL = f"""
    WITH n AS ({_NORMED_SQL}),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_DOT_SQL.format(a='a.v', b='b.v')} / (a.nrm * b.nrm) AS cs
        FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, {fround_sql("cs")} AS cosine_sim
    FROM pairs WHERE cs >= 0.4
    ORDER BY vec_a, vec_b
    """


def sim_neardup_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (blocked by coarse cell, cosine
    >= 0.4). Same blocking trick as sim_ivf_topk; the threshold variant is
    what an embedding-dedup stage runs corpus-wide."""
    e = _emb(spark, sf_dir)
    n = e.select("vec_id", "label", _to_double("embedding").alias("v")).withColumn(
        "nrm", _norm(F.col("v"))
    )
    a = n.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("la"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = n.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    pairs = a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b"))).select(
        "vec_a", "vec_b", (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cs")
    )
    return (
        pairs.filter(F.col("cs") >= 0.4)
        .select("vec_a", "vec_b", fround("cs").alias("cosine_sim"))
        .orderBy("vec_a", "vec_b")
    )


_KNN_K = 3

KNN_SQL = f"""
    WITH n AS ({_NORMED_SQL}),
    scored AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
               {_DOT_SQL.format(a='a.v', b='b.v')} / (a.nrm * b.nrm) AS cs
        FROM n a JOIN n b ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    r AS (
        SELECT vec_id, neighbor_id, {fround_sql("cs")} AS cosine_sim,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT vec_id, neighbor_id, cosine_sim, rnk FROM r WHERE rnk <= {_KNN_K}
    ORDER BY vec_id, rnk
    """


def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide k-NN graph blocked by the coarse cell (label stands in
    for the nearest-centroid id, as in sim_ivf_topk): each vector's top-3
    same-cell neighbors — operators/similarity.knn_graph. Both engines sum
    the dot product in array-index order, so the unrounded doubles driving
    the rank window agree bit-for-bit."""
    from carrot_transform_spark.operators.similarity import knn_graph

    e = _emb(spark, sf_dir)
    return (
        knn_graph(e, "label", k=_KNN_K)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id", "rnk")
    )


_MP_PROBES = 2


def sim_knn_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe k-NN graph (operators/similarity.knn_graph_multiprobe):
    candidates live in their nearest-centroid primary cell, each node
    probes its _MP_PROBES nearest cells. Exercises the whole broadcast-
    codebook quantization chain (assign_cells + probe_cells) plus the
    probe-fanout join against the DuckDB twin, which recomputes every
    centroid cosine with the identical sequential `+`-chain so primary
    cells, probe sets, and the final rank window agree bit-for-bit."""
    from carrot_transform_spark.operators.similarity import knn_graph_multiprobe

    e = _emb(spark, sf_dir)
    return (
        knn_graph_multiprobe(e, _CENTROIDS, n_probe=_MP_PROBES, k=_KNN_K)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id", "rnk")
    )


def _knn_multiprobe_sql() -> str:
    sims = []
    for ci, c in enumerate(_CENTROIDS):
        dot = " + ".join(f"CAST(embedding[{d + 1}] AS DOUBLE) * ({c[d]!r})" for d in range(64))
        cn = float(sum(x * x for x in c) ** 0.5) or 1.0
        sims.append(
            f"SELECT vec_id, {ci} AS cell, (({dot}) / (nrm * {cn!r})) AS sim FROM n"
        )
    sims_sql = " UNION ALL ".join(sims)
    return f"""
    WITH n AS (
        SELECT vec_id, embedding,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings WHERE vec_id < {_EMB_BOUND}
    ),
    sims AS ({sims_sql}),
    ranked AS (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS pr
        FROM sims
    ),
    cand AS (
        SELECT n.vec_id, n.v, n.nrm, r.cell
        FROM n JOIN ranked r ON r.vec_id = n.vec_id AND r.pr = 1
    ),
    q AS (
        SELECT n.vec_id, n.v, n.nrm, r.cell
        FROM n JOIN ranked r ON r.vec_id = n.vec_id AND r.pr <= {_MP_PROBES}
    ),
    scored AS (
        SELECT q.vec_id AS vec_id, c.vec_id AS neighbor_id,
               {_DOT_SQL.format(a='q.v', b='c.v')} / (q.nrm * c.nrm) AS cs
        FROM q JOIN cand c ON c.cell = q.cell AND c.vec_id <> q.vec_id
    ),
    rr AS (
        SELECT vec_id, neighbor_id, {fround_sql('cs')} AS cosine_sim,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT vec_id, neighbor_id, cosine_sim, rnk FROM rr WHERE rnk <= {_KNN_K}
    ORDER BY vec_id, rnk
    """



_CENTROIDS = [
    [1.0 if d % 2 == 0 else -1.0 for d in range(64)],
    [1.0 if d % 3 == 0 else -0.5 for d in range(64)],
    [(-1.0) ** d * (1.0 + d / 64.0) for d in range(64)],
]

KNN_MP_SQL = _knn_multiprobe_sql()


def _centroid_sql() -> str:
    cases = []
    norms = []
    for ci, c in enumerate(_CENTROIDS):
        dot = " + ".join(f"CAST(embedding[{d + 1}] AS DOUBLE) * ({c[d]!r})" for d in range(64))
        nrm = sum(x * x for x in c) ** 0.5
        norms.append(f"(({dot}) / {nrm!r})")
    # argmax with first-wins tie-break (strictly-greater comparison chain)
    sel = []
    for ci in range(len(_CENTROIDS)):
        conds = []
        for cj in range(len(_CENTROIDS)):
            if cj == ci:
                continue
            op = ">=" if cj > ci else ">"
            conds.append(f"{norms[ci]} {op} {norms[cj]}")
        sel.append(f"WHEN {' AND '.join(conds)} THEN {ci}")
    return f"CASE {' '.join(sel)} END"


CENTROID_SQL = f"""
    SELECT vec_id, {_centroid_sql()} AS cell
    FROM embeddings WHERE vec_id < {_EMB_BOUND} ORDER BY vec_id
    """


def sim_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse quantizer: nearest of K literal centroids by cosine — how an
    IVF layout is built without MLlib. Uses operators/similarity.assign_cells
    (cosine argmax with first-wins tie-break)."""
    from carrot_transform_spark.operators.similarity import assign_cells

    e = _emb(spark, sf_dir)
    out = assign_cells(e, _CENTROIDS)
    return out.select(F.col("id").alias("vec_id"), "cell").orderBy("vec_id")


# ---------------------------------------------------------------------------
# k-means (Lloyd) — iterative algorithm, oracle-checked by unrolling the
# same number of iterations in SQL. Possible only because every iteration
# rounds its centroids to 6 decimals through exact decimal aggregation
# (operators/kmeans.py), so both engines hold bit-identical state between
# iterations.
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 2
_KM_DIM = 64
_KM_M = 1_000_000


def sim_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final (vec_id, cell) after _KM_ITERS Lloyd iterations from a
    deterministic first-k init."""
    from carrot_transform_spark.operators.kmeans import lloyd

    e = _emb(spark, sf_dir)
    final, _cents = lloyd(e, k=_KM_K, iters=_KM_ITERS)
    return final.select(F.col("id").alias("vec_id"), "cell").orderBy("vec_id")


def _kmeans_sql() -> str:
    """Unrolled Lloyd twin: centroids as (cell, dim, c) component rows."""
    rnd = f"FLOOR({{x}} * {_KM_M} + 0.5) / {_KM_M}"
    parts = [
        f"""ecomp AS (
        SELECT vec_id, u.dim, CAST(embedding[u.dim] AS DOUBLE) AS x
        FROM embeddings, (SELECT unnest(generate_series(1, {_KM_DIM})) AS dim) u
        WHERE vec_id < {_EMB_BOUND}
    ),
    cells AS (SELECT unnest(generate_series(0, {_KM_K - 1})) AS cell),
    dims AS (SELECT unnest(generate_series(1, {_KM_DIM})) AS dim),
    seeds AS (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell
        FROM (SELECT vec_id FROM embeddings WHERE vec_id < {_EMB_BOUND}
              ORDER BY vec_id LIMIT {_KM_K})
    ),
    c0 AS (
        SELECT s.cell, ec.dim, {rnd.format(x="ec.x")} AS c
        FROM seeds s JOIN ecomp ec ON ec.vec_id = s.vec_id
    )"""
    ]
    prev = "c0"
    for it in range(1, _KM_ITERS + 1):
        mean = f"CAST(SUM(CAST(ec.x AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*)"
        parts.append(
            f"""d{it} AS (
        SELECT ec.vec_id, cc.cell,
               SUM(CAST((ec.x - cc.c) * (ec.x - cc.c) AS DECIMAL(38,12))) AS dist
        FROM ecomp ec JOIN {prev} cc ON ec.dim = cc.dim
        GROUP BY ec.vec_id, cc.cell
    ),
    a{it} AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
            FROM d{it}
        ) WHERE rn = 1
    ),
    m{it} AS (
        SELECT a.cell, ec.dim, {rnd.format(x=f"({mean})")} AS c
        FROM ecomp ec JOIN a{it} a ON ec.vec_id = a.vec_id
        GROUP BY a.cell, ec.dim
    ),
    c{it} AS (
        SELECT cells.cell, dims.dim, COALESCE(m.c, 0.0) AS c
        FROM cells CROSS JOIN dims
        LEFT JOIN m{it} m ON m.cell = cells.cell AND m.dim = dims.dim
    )"""
        )
        prev = f"c{it}"
    fin = _KM_ITERS + 1
    parts.append(
        f"""dfin AS (
        SELECT ec.vec_id, cc.cell,
               SUM(CAST((ec.x - cc.c) * (ec.x - cc.c) AS DECIMAL(38,12))) AS dist
        FROM ecomp ec JOIN {prev} cc ON ec.dim = cc.dim
        GROUP BY ec.vec_id, cc.cell
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + """
    SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
        FROM dfin
    ) WHERE rn = 1
    ORDER BY vec_id
    """
    )


KMEANS_SQL = _kmeans_sql()
