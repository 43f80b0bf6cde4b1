"""Random-hyperplane LSH over the embeddings table.

The scale path for angular similarity when no IVF cell column exists:
- P pseudo-random hyperplanes with deterministic ±1 entries derived from
  md5 (reproducible bit-for-bit in the DuckDB oracle);
- signature bit p = [dot(v, plane_p) > 0]; bucket = packed bits;
- near-neighbor candidates share a bucket (P(collision) = (1 - θ/π)^P),
  then exact cosine verification.

All JVM-side: plane vectors are literal arrays folded with zip_with.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from carrot_transform_spark.functions.rounding import fround, fround_sql
from carrot_transform_spark.queries.similarity import _EMB_BOUND, _emb
from carrot_transform_spark.queries import load, register_suite  # noqa: F401

_DIM = 64
_PLANES = 8


def _plane_entry(p: int, d: int) -> int:
    """Deterministic ±1 from md5(p:d) parity — reproducible in any engine."""
    h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
    return 1 if int(h[:8], 16) % 2 == 1 else -1


_PLANE_VECS = [[_plane_entry(p, d) for d in range(_DIM)] for p in range(_PLANES)]


def _bucket_col() -> F.Column:
    v = F.col("v")
    bits = []
    for p in range(_PLANES):
        plane = F.array(*[F.lit(float(x)) for x in _PLANE_VECS[p]])
        dot = F.aggregate(
            F.zip_with(v, plane, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        )
        bits.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _bucket_sql() -> str:
    terms = []
    for p in range(_PLANES):
        prods = " + ".join(
            f"CAST(embedding[{d + 1}] AS DOUBLE) * ({_PLANE_VECS[p][d]})" for d in range(_DIM)
        )
        terms.append(f"CASE WHEN ({prods}) > 0 THEN {1 << p} ELSE 0 END")
    return " + ".join(terms)


_BUCKETS_SQL = f"""
    SELECT vec_id, {_bucket_sql()} AS bucket
    FROM embeddings WHERE vec_id < {_EMB_BOUND} ORDER BY vec_id
    """


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector 8-bit random-hyperplane signature (the LSH bucket id)."""
    e = _emb(spark, sf_dir)
    n = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    return n.select("vec_id", _bucket_col().alias("bucket")).orderBy("vec_id")


_CAND_SQL = f"""
    WITH b AS (SELECT vec_id, {_bucket_sql()} AS bucket,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings WHERE vec_id < {_EMB_BOUND}),
    n AS (SELECT vec_id, bucket, v,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM b),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               list_sum(list_transform(list_zip(a.v, b.v), s -> s[1] * s[2]))
                   / (a.nrm * b.nrm) AS cs
        FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, {fround_sql("cs")} AS cosine_sim
    FROM pairs WHERE cs >= 0.3
    ORDER BY vec_a, vec_b
    """


def ann_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-collision candidates verified by exact cosine (>= 0.3). The
    bucket join replaces the all-pairs scan: expected candidate volume is
    |pairs| x (1 - theta/pi)^P."""
    e = _emb(spark, sf_dir)
    n = (
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("bucket", _bucket_col())
        .withColumn(
            "nrm",
            F.sqrt(
                F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
            ),
        )
    )
    a = n.select(
        F.col("vec_id").alias("vec_a"), F.col("bucket").alias("ba"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = n.select(
        F.col("vec_id").alias("vec_b"), F.col("bucket").alias("bb"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    cs = (
        F.aggregate(
            F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (F.col("na") * F.col("nb"))
    )
    return (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", cs.alias("cs"))
        .filter(F.col("cs") >= 0.3)
        .select("vec_a", "vec_b", fround("cs").alias("cosine_sim"))
        .orderBy("vec_a", "vec_b")
    )


_SEMDEDUP_THRESHOLD = 0.4


def sim_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep-list (operators/semdedup.py): within-cell cosine pairs
    >= threshold -> connected components -> keep the min-id member per
    group. One output row per corpus vector; filter(keep=1) IS the
    deduplicated corpus. Blocking via the label column (standing in for the
    nearest-centroid cell an IVF/k-means stage assigns at scale)."""
    from carrot_transform_spark.operators.semdedup import semantic_dedup

    e = _emb(spark, sf_dir)
    out = semantic_dedup(e, cell_col="label", threshold=_SEMDEDUP_THRESHOLD)
    return out.select(F.col("id").alias("vec_id"), "component_id", "keep").orderBy(
        "vec_id"
    )


def _semdedup_sql() -> str:
    from carrot_transform_spark.queries.similarity import _DOT_SQL, _NORMED_SQL

    dot = _DOT_SQL.format(a="a.v", b="b.v")
    return f"""
    WITH RECURSIVE n AS ({_NORMED_SQL}),
    p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {dot} / (a.nrm * b.nrm) >= {_SEMDEDUP_THRESHOLD}
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
    reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges) nodes
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (SELECT a AS id, MIN(b) AS component_id FROM reach GROUP BY a)
    SELECT e.vec_id, COALESCE(c.component_id, e.vec_id) AS component_id,
           CASE WHEN COALESCE(c.component_id, e.vec_id) = e.vec_id
                THEN 1 ELSE 0 END AS keep
    FROM embeddings e LEFT JOIN comp c ON c.id = e.vec_id
    WHERE e.vec_id < {_EMB_BOUND}
    ORDER BY vec_id
    """


_SD_MP_PROBES = 2
_SD_MP_THRESHOLD = 0.6


def _mp_planted() -> list[tuple[int, list[float]]]:
    """Two planted near-duplicates straddling the c0/c1 cell boundary of
    the literal codebook: each sits just off the bisector of the first two
    centroids, tipped to opposite sides — primary cells differ, cosine
    ~0.998. Components are multiples of 1/32, so the float32 storage cast
    and every engine's double math are exact."""
    import math

    from carrot_transform_spark.queries.similarity import _CENTROIDS

    c0, c1 = _CENTROIDS[0], _CENTROIDS[1]
    n0 = math.sqrt(sum(x * x for x in c0))
    n1 = math.sqrt(sum(x * x for x in c1))
    u0 = [x / n0 for x in c0]
    u1 = [x / n1 for x in c1]

    def mk(tip):
        return [round((a + b + 0.05 * e) * 32) / 32 for a, b, e in zip(u0, u1, tip)]

    return [(10_000_000_000, mk(u0)), (10_000_000_001, mk(u1))]


def sim_semantic_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with cross-cell recall (semantic_dedup n_probe=2 over the
    literal centroids): candidates live in their primary cell, every
    vector probes its 2 nearest cells, so the PLANTED boundary pair —
    whose members quantize into different primary cells and which
    single-cell blocking therefore provably cannot pair — lands in one
    component. The corpus is the vec_id%4 slice of the embeddings table
    plus the two planted rows; the oracle recomputes quantization, probe
    ranking, the pair join, and the component closure from scratch."""
    from carrot_transform_spark.operators.semdedup import semantic_dedup
    from carrot_transform_spark.queries.similarity import _CENTROIDS

    e = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") % 4 == 0)
        .select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    )
    extra = spark.createDataFrame(_mp_planted(), "vec_id long, embedding array<float>")
    u = e.unionByName(extra)
    out = semantic_dedup(
        u, centroids=_CENTROIDS, threshold=_SD_MP_THRESHOLD, n_probe=_SD_MP_PROBES
    )
    return out.select(F.col("id").alias("vec_id"), "component_id", "keep").orderBy(
        "vec_id"
    )


def _semdedup_mp_sql() -> str:
    from carrot_transform_spark.queries.similarity import _CENTROIDS, _DOT_SQL

    vals = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in v)}]::DOUBLE[])"
        for i, v in _mp_planted()
    )
    sims = []
    for ci, c in enumerate(_CENTROIDS):
        dot = " + ".join(f"n.v[{d + 1}] * ({c[d]!r})" for d in range(64))
        cn = float(sum(x * x for x in c) ** 0.5) or 1.0
        sims.append(
            f"SELECT vec_id, {ci} AS cell, (({dot}) / (nrm * {cn!r})) AS sim FROM n"
        )
    sims_sql = " UNION ALL ".join(sims)
    dot_ab = _DOT_SQL.format(a="q.v", b="c.v")
    return f"""
    WITH RECURSIVE base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE vec_id % 4 = 0 AND vec_id < {_EMB_BOUND}
        UNION ALL
        SELECT * FROM (VALUES {vals}) pl(vec_id, v)
    ),
    n AS (SELECT vec_id, v,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM base),
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
        FROM n JOIN ranked r ON r.vec_id = n.vec_id AND r.pr <= {_SD_MP_PROBES}
    ),
    p AS (
        SELECT DISTINCT LEAST(q.vec_id, c.vec_id) AS id_a,
                        GREATEST(q.vec_id, c.vec_id) AS id_b
        FROM q JOIN cand c ON c.cell = q.cell AND c.vec_id <> q.vec_id
        WHERE {dot_ab} / (q.nrm * c.nrm) >= {_SD_MP_THRESHOLD}
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
    reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges) nodes
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (SELECT a AS id, MIN(b) AS component_id FROM reach GROUP BY a)
    SELECT b.vec_id, COALESCE(c2.component_id, b.vec_id) AS component_id,
           CASE WHEN COALESCE(c2.component_id, b.vec_id) = b.vec_id
                THEN 1 ELSE 0 END AS keep
    FROM base b LEFT JOIN comp c2 ON c2.id = b.vec_id
    ORDER BY vec_id
    """


# ---------------------------------------------------------------------------
# suite: blocking/quantization checks as one entry (the exact and IVF top-k
# queries stay standalone in similarity.py)
# ---------------------------------------------------------------------------

from carrot_transform_spark.queries.similarity import (  # noqa: E402
    CENTROID_SQL,
    KMEANS_SQL,
    KNN_MP_SQL,
    KNN_SQL,
    NEARDUP_SQL,
    sim_centroid_assign,
    sim_kmeans_lloyd,
    sim_knn_graph,
    sim_knn_multiprobe,
    sim_neardup_threshold,
)
from carrot_transform_spark.queries.tfidf_q import (  # noqa: E402
    TFIDF_SQL,
    sim_tfidf_cosine,
)

register_suite(
    "sim_blocking_suite",
    [
        (
            "sim_centroid_assign",
            sim_centroid_assign,
            CENTROID_SQL,
            [("vec_id", "i"), ("cell", "i")],
        ),
        (
            "sim_neardup_threshold",
            sim_neardup_threshold,
            NEARDUP_SQL,
            [("vec_a", "i"), ("vec_b", "i"), ("cosine_sim", "f")],
        ),
        (
            "ann_lsh_buckets",
            ann_lsh_buckets,
            _BUCKETS_SQL,
            [("vec_id", "i"), ("bucket", "i")],
        ),
        (
            "ann_lsh_candidate_pairs",
            ann_lsh_candidate_pairs,
            _CAND_SQL,
            [("vec_a", "i"), ("vec_b", "i"), ("cosine_sim", "f")],
        ),
        (
            "sim_tfidf_cosine",
            sim_tfidf_cosine,
            TFIDF_SQL,
            [("doc_a", "i"), ("doc_b", "i"), ("cosine", "f"), ("rnk", "i")],
        ),
        (
            "sim_kmeans_lloyd",
            sim_kmeans_lloyd,
            KMEANS_SQL,
            [("vec_id", "i"), ("cell", "i")],
        ),
        (
            "sim_semantic_dedup",
            sim_semantic_dedup,
            _semdedup_sql(),
            [("vec_id", "i"), ("component_id", "i"), ("keep", "i")],
        ),
        (
            "sim_knn_graph",
            sim_knn_graph,
            KNN_SQL,
            [("vec_id", "i"), ("neighbor_id", "i"), ("cosine_sim", "f"), ("rnk", "i")],
        ),
        (
            "sim_knn_multiprobe",
            sim_knn_multiprobe,
            KNN_MP_SQL,
            [("vec_id", "i"), ("neighbor_id", "i"), ("cosine_sim", "f"), ("rnk", "i")],
        ),
        (
            "sim_semantic_multiprobe",
            sim_semantic_multiprobe,
            _semdedup_mp_sql(),
            [("vec_id", "i"), ("component_id", "i"), ("keep", "i")],
        ),
    ],
    tags=("similarity", "lsh", "suite"),
)
