"""Streaming IVF vector-index maintenance + incremental embedding near-dup.

The embedding twin of streaming/dedup_index.py, on the same UnitStore
commit substrate (protocol in streaming/maintenance.py): each micro-batch
of vectors is coarse-quantized to its nearest centroid cell
(operators/similarity.assign_cells — broadcast-data codebook, no UDF),
near-dup pairs against the index-so-far plus the batch are emitted, and
the batch commits as one versioned unit of (id, v, nrm, cell) rows.

Invariant (tested): union of per-step pair outputs == the one-shot
cell-blocked neardup_pairs over the full corpus — a pair is discovered
exactly once, when its later member arrives.

Query-time search (`search_vector_store`) reads the committed units as the
IVF corpus, reusing BOTH the stored cell ids and the stored norms — only
the query batch is quantized and normed; at 100 TB each unit is
cell-partitioned parquet, so a probe is a partition-pruned scan of n_probe
cells per unit, and compaction (compact_every) restores one-dir-per-cell
locality without stopping ingest.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from carrot_transform_spark.operators.similarity import _normed, assign_cells, dot
from carrot_transform_spark.functions.rounding import fround
from carrot_transform_spark.operators.unitstore import UnitStore
from carrot_transform_spark.streaming.maintenance import maintain_units

_DATASET = "vectors"


def vector_store(spark: SparkSession, path: str) -> UnitStore:
    return UnitStore(spark, path, (_DATASET,))


def ivf_corpus(spark: SparkSession, path: str) -> DataFrame:
    """(id, v, nrm, cell) over all committed units — the IVF search corpus."""
    return vector_store(spark, path).load(_DATASET)


def compact_vector_store(spark: SparkSession, path: str, vacuum: bool = True) -> str:
    """Fold all live units into ONE unit hive-partitioned by cell, so
    every probe becomes a partition-pruned scan: a filter or broadcast
    join on `cell` touches only the matching cell=… subdirs (static
    PartitionFilters / dynamic partition pruning) instead of every file.
    Run it when enough streamed units accumulate — the rewrite is exactly
    one shuffle-free pass plus the atomic commit. Returns the new unit
    name."""
    store = vector_store(spark, path)
    unit = store.fresh_unit("c")
    replaced = store.compact(unit, partition_by={_DATASET: ["cell"]})
    if vacuum:
        store.vacuum(replaced)
    return unit


def search_vector_store(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Multi-probe IVF top-k over the committed store, reusing the cell ids
    AND norms the maintainer already computed — only the (small) query
    batch is quantized. (query_id, neighbor_id, cosine_sim, rnk)."""
    from carrot_transform_spark.operators.similarity import ivf_topk_multiprobe

    return ivf_topk_multiprobe(
        ivf_corpus(spark, path), queries, centroids, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col, k=k, normed_corpus=True,
    )


def _side(df: DataFrame, suffix: str) -> DataFrame:
    return df.select(
        F.col("id").alias(f"id_{suffix}"), F.col("cell").alias(f"c{suffix}"),
        F.col("v").alias(f"v{suffix}"), F.col("nrm").alias(f"n{suffix}"),
    )


def _cell_pairs(
    new: DataFrame,
    old: DataFrame,
    threshold: float,
    max_cell_size: int | None = None,
) -> DataFrame:
    """Same-cell cosine pairs (id_a < id_b) touching `new`: each such pair
    exactly once — either its smaller id is new (p1: new vs old+new) or its
    smaller id is old and the larger is new (p2). Frames carry
    (id, v, nrm, cell).

    ``max_cell_size`` bounds the STORE side per cell (the batch side is
    already bounded by the micro-batch): a degenerate store cell — a
    duplicate blob grown over many batches — contributes only its cap
    deterministic representatives, so per-batch work stays
    O(|batch ∩ cell| x cap) instead of growing with the blob. New items in
    a capped cell still pair with the representatives, so they join the
    blob's dedup component; cells at or under the bound are untouched."""
    from carrot_transform_spark.operators.similarity import _cap_cell

    old = _cap_cell(old, "cell", max_cell_size)
    lt = (F.col("ca") == F.col("cb")) & (F.col("id_a") < F.col("id_b"))
    p1 = _side(new, "a").join(_side(old.unionByName(new), "b"), lt)
    p2 = _side(old, "a").join(_side(new, "b"), lt)
    pairs = p1.unionByName(p2).select(
        "id_a", "id_b",
        (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cs"),
    )
    return pairs.filter(F.col("cs") >= threshold).select(
        "id_a", "id_b", fround("cs").alias("cosine_sim")
    )


def maintain_vector_index(
    vectors: DataFrame,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    compact_every: int | None = None,
    max_cell_size: int | None = None,
):
    """Start (and return) the streaming query maintaining the IVF store.

    `vectors` is a streaming DataFrame of (id_col, vec_col, ...). Each
    micro-batch appends one store unit `s<batch_id>` and one pairs dir
    `{pairs_dir}/s<batch_id>`; read all discovered pairs back with
    spark.read.parquet(f"{pairs_dir}/s*")."""
    spark = vectors.sparkSession

    def step(batch_df: DataFrame, store, units: list[str], unit: str) -> None:
        cells = assign_cells(batch_df, centroids, id_col, vec_col).withColumnRenamed(
            "id", "__cid"
        )
        new = (
            _normed(batch_df, id_col, vec_col)
            .join(cells, F.col("id") == F.col("__cid"))
            .drop("__cid")
            .localCheckpoint(eager=True)  # small batch; reused by pairs + commit
        )
        old = (
            store.load(_DATASET, units)
            if units
            else spark.createDataFrame([], new.schema)
        )
        pairs = _cell_pairs(new, old, threshold, max_cell_size).localCheckpoint(eager=True)
        pairs.write.mode("overwrite").parquet(f"{pairs_dir}/{unit}")
        store.commit(unit, {_DATASET: new})

    return maintain_units(
        vectors,
        checkpoint_dir,
        lambda: vector_store(spark, store_dir),
        step,
        compact_every=compact_every,
    )


# ---------------------------------------------------------------------------
# IVF-PQ store: the memory-bound variant. Instead of full vectors the
# store holds (id, cell, code) — m byte-codes per vector (operators/pq.py)
# — with the per-subspace codebooks trained on the FIRST batch and frozen
# as store metadata (the standard recipe: train on a sample, encode
# everything after with the same books so codes stay comparable).
# Search: probe the query's nearest cells, ADC-score only those cells'
# codes from per-query lookup tables, top-k (set-oriented batch form:
# search_pq_store_batch). At 100 TB this is the
# FAISS IVFPQ layout as plain Spark: 8-16 bytes per vector instead of
# 4*dim, cell-pruned scans, no decompression.
# ---------------------------------------------------------------------------

import json as _json

_PQ_DATASET = "codes"
_CODEBOOKS = "_CODEBOOKS"
_CODEBOOKS_DIST = "_CODEBOOKS_DIST"
_META_BOOKS = "_meta-codebooks"
_META_BOOKS_DIST = "_meta-codebooks-dist"


def pq_store(spark: SparkSession, path: str) -> UnitStore:
    return UnitStore(spark, path, (_PQ_DATASET,))


def _load_codebooks(store: UnitStore):
    """Current codebooks: the newest live unit carrying a retrained-books
    sidecar wins (a retrain compacts every live unit, so at most one live
    unit has one — and compact() carries it forward through later routine
    compactions); otherwise the store-level file frozen by the first
    batch. Sidecars are written before _COMMIT, so the books and the codes
    they encoded switch atomically together."""
    for u in sorted(store.units(), reverse=True):
        body = store.sidecars(u).get(_META_BOOKS)
        if body is not None:
            return _json.loads(body)
    fs, jvm = store._fs()
    p = store._jp(jvm, _CODEBOOKS)
    if not fs.exists(p):
        return None
    return _json.loads(store._read_file(fs, jvm, (_CODEBOOKS,)))


def _load_baseline_distortion(store: UnitStore):
    """Training-time quantization distortion of the CURRENT books (same
    sidecar-first resolution as _load_codebooks, so books and their
    baseline always come from the same commit); None for stores written
    before drift tracking existed."""
    for u in sorted(store.units(), reverse=True):
        if store.sidecars(u).get(_META_BOOKS) is not None:
            body = store.sidecars(u).get(_META_BOOKS_DIST)
            return _json.loads(body) if body is not None else None
    fs, jvm = store._fs()
    p = store._jp(jvm, _CODEBOOKS_DIST)
    if not fs.exists(p):
        return None
    return _json.loads(store._read_file(fs, jvm, (_CODEBOOKS_DIST,)))


def maintain_pq_index(
    vectors: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    m: int = 8,
    k_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_every: int | None = None,
    corpus_source=None,
    drift_factor: float = 4.0,
):
    """Streaming maintainer for the IVF-PQ store. The first batch trains
    the codebooks (written to store metadata BEFORE its unit commits, so a
    replay retrains identically and overwrites the same file); every batch
    is cell-assigned and PQ-encoded, committing (id, cell, code) units.
    After a retrain_pq_store() refresh, later batches pick up the
    retrained books automatically (_load_codebooks resolves the newest
    live sidecar first). With ``corpus_source`` set, drift is tracked per
    batch and the retrain happens automatically inside the step when the
    batch's quantization distortion exceeds ``drift_factor`` x the
    training baseline (see pq_step_fn)."""
    spark = vectors.sparkSession
    return maintain_units(
        vectors,
        checkpoint_dir,
        lambda: pq_store(spark, store_dir),
        pq_step_fn(
            centroids, m=m, k_sub=k_sub, id_col=id_col, vec_col=vec_col,
            corpus_source=corpus_source, drift_factor=drift_factor,
        ),
        compact_every=compact_every,
    )


def pq_step_fn(
    centroids: list[list[float]],
    m: int = 8,
    k_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_source=None,
    drift_factor: float = 4.0,
):
    """The per-batch step of maintain_pq_index, exposed so tests can drive
    batches and replays deterministically without the streaming engine.

    Drift-triggered retrain: with ``corpus_source`` set (a zero-arg
    callable returning the raw full-vector corpus — PQ codes are lossy, so
    the vectors come from wherever they live: the full-vector store, the
    source table, cold storage), every batch's mean quantization
    distortion under the current books (operators/pq.
    quantization_distortion — one narrow agg per batch) is compared to the
    training-time baseline riding with the books; when it exceeds
    ``drift_factor`` x baseline, the step retrains INSIDE its own
    sequencing — books are fit on stored-corpus + this batch (hash-spread
    seeding), every stored id is re-encoded, and the result compacts into
    one atomic unit before the batch commits under the new books. Because
    the retrain runs between two commits of the single maintainer, the
    concurrent-writer hazard retrain_pq_store documents cannot occur.
    Crash between the retrain compact and the batch commit is safe: the
    replayed step re-measures distortion under the RETRAINED books (now
    below the refreshed baseline) and just commits the batch.

    Without ``corpus_source`` the step never retrains (the knob for
    deployments that refresh books on a schedule via retrain_pq_store)."""
    from carrot_transform_spark.operators.pq import (
        encode,
        quantization_distortion,
        train_codebooks,
    )

    def step(batch_df: DataFrame, store, units: list[str], unit: str) -> None:
        books = _load_codebooks(store)
        if books is None or not units:
            # first (or replayed-first) batch: train + freeze. Deterministic
            # Lloyd on the same rows -> identical books on replay.
            books = train_codebooks(batch_df, m=m, k_sub=k_sub, id_col=id_col, vec_col=vec_col)
            store._write_file((_CODEBOOKS,), _json.dumps(books))
            dist0 = quantization_distortion(batch_df, books, id_col, vec_col)
            store._write_file((_CODEBOOKS_DIST,), _json.dumps(dist0))
        elif corpus_source is not None:
            dist0 = _load_baseline_distortion(store)
            cur = quantization_distortion(batch_df, books, id_col, vec_col)
            if dist0 is not None and dist0 > 0 and cur > drift_factor * dist0:
                _retrain(
                    store, corpus_source(), centroids, m, k_sub, id_col, vec_col,
                    vacuum=True, train_extra=batch_df,
                )
                books = _load_codebooks(store)
        cells = assign_cells(batch_df, centroids, id_col, vec_col).withColumnRenamed(
            "id", "__cid"
        )
        codes = (
            encode(batch_df, books, id_col=id_col, vec_col=vec_col)
            .join(cells, F.col("id") == F.col("__cid"))
            .drop("__cid")
        )
        store.commit(unit, {_PQ_DATASET: codes})

    return step


def search_pq_store_batch(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    n_probe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, approx_dist, rnk): set-oriented IVF-PQ
    search — a whole query FRAME against the committed store in one plan
    (adc_topk_batch), instead of search_pq_store's one-query-per-call
    driver loop. Each query probes its n_probe nearest cells
    (similarity.probe_cells); per-query ADC lookup tables are computed
    distributedly from the broadcast codebook frame and broadcast onto
    the cell-pruned codes."""
    from carrot_transform_spark.operators.pq import adc_topk_batch
    from carrot_transform_spark.operators.similarity import probe_cells

    store = pq_store(spark, path)
    books = _load_codebooks(store)
    if books is None:
        raise FileNotFoundError(f"no codebooks under {path}")
    qcells = probe_cells(queries, centroids, n_probe, id_col, vec_col).withColumnRenamed(
        "id", "query_id"
    )
    return adc_topk_batch(
        store.load(_PQ_DATASET),
        queries,
        books,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        query_cells=qcells,
    )


def _retrain(
    store: UnitStore,
    vectors: DataFrame,
    centroids: list[list[float]],
    m: int,
    k_sub: int,
    id_col: str,
    vec_col: str,
    vacuum: bool,
    train_extra: DataFrame | None = None,
) -> str:
    """Shared retrain body (see retrain_pq_store / pq_step_fn): fit new
    books, re-encode every stored id, compact into one atomic unit whose
    sidecars carry the books AND their fresh distortion baseline.
    ``train_extra`` widens the TRAINING corpus only (the in-flight batch
    during an auto-retrain — its codes commit separately right after)."""
    from carrot_transform_spark.operators.pq import (
        encode,
        quantization_distortion,
        train_codebooks,
    )

    src = store.units()
    if not src:
        raise FileNotFoundError(f"no committed units under {store.path}")
    # only re-encode ids the store actually holds (the caller's vector
    # frame may be a superset — e.g. the full source table)
    stored_ids = store.load(_PQ_DATASET, src).select("id").distinct()
    corpus = vectors.join(
        stored_ids, vectors[id_col] == stored_ids["id"], "left_semi"
    )
    train_df = corpus.select(id_col, vec_col)
    if train_extra is not None:
        train_df = train_df.unionByName(train_extra.select(id_col, vec_col))
    # hash-spread seeding: first-k-id seeds all come from the pre-drift
    # region and leave the drifted cluster a single codeword per subspace
    books = train_codebooks(
        train_df, m=m, k_sub=k_sub, id_col=id_col, vec_col=vec_col, init="hash"
    )
    dist0 = quantization_distortion(train_df, books, id_col, vec_col)
    cells = assign_cells(corpus, centroids, id_col, vec_col).withColumnRenamed(
        "id", "__cid"
    )
    codes = (
        encode(corpus, books, id_col=id_col, vec_col=vec_col)
        .join(cells, F.col("id") == F.col("__cid"))
        .drop("__cid")
    )
    unit = store.fresh_unit("r")
    replaced = store.compact(
        unit,
        units=src,
        frames={_PQ_DATASET: codes},
        sidecar_files={
            _META_BOOKS: _json.dumps(books),
            _META_BOOKS_DIST: _json.dumps(dist0),
        },
    )
    if vacuum:
        store.vacuum(replaced)
    return unit


def retrain_pq_store(
    spark: SparkSession,
    path: str,
    vectors: DataFrame,
    centroids: list[list[float]],
    m: int = 8,
    k_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vacuum: bool = True,
) -> str:
    """Compaction-time codebook refresh for a drifted corpus. The frozen
    first-batch codebooks underquantize vectors from a shifted
    distribution (recall decays as the corpus drifts); this retrains
    per-subspace books on `vectors` (the store's raw corpus — PQ codes are
    lossy, so the full vectors come from wherever they live: the
    full-vector store, the source table, cold storage), re-encodes every
    stored id under the new books, and commits codes + books as ONE
    compacted unit — the books ride as a ``_meta-*`` sidecar inside the
    unit's atomic commit, so readers never see new codes with old books or
    vice versa. Returns the new unit name.

    QUIESCENCE REQUIRED: stop (or pause) any live maintain_pq_index
    stream before calling this. The retrain snapshots the unit list at
    entry; a unit committed by a concurrent maintainer between that
    snapshot and the compact survives the compaction with codes encoded
    under the OLD books, while the sidecar switches every reader to the
    NEW books — silently wrong ADC distances for that unit. For a store
    that must keep ingesting, use the drift-triggered retrain built into
    pq_step_fn(corpus_source=...) instead: it runs the same retrain
    between two commits of the single writer, so the window cannot exist.

    Replay-safe: training is deterministic Lloyd, so re-running after a
    crash converges to identical books and codes; the commit point is the
    same crash-atomic UnitStore transition every maintainer uses. Batches
    streamed after the retrain pick up the new books through
    _load_codebooks' sidecar-first resolution."""
    return _retrain(
        pq_store(spark, path), vectors, centroids, m, k_sub, id_col, vec_col, vacuum
    )


def search_pq_store(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    centroids: list[list[float]],
    n_probe: int = 2,
    k: int = 5,
) -> DataFrame:
    """(neighbor_id, approx_dist, rnk): ADC top-k over the probed cells'
    codes — the corpus is never decompressed; scoring is m table lookups
    per candidate row. One query per call (the lookup tables are plan
    literals); batch query sets loop on the driver or use the full-vector
    store's set-oriented probes instead."""
    from carrot_transform_spark.operators.pq import adc_topk
    from carrot_transform_spark.operators.similarity import probe_cells

    store = pq_store(spark, path)
    books = _load_codebooks(store)
    if books is None:
        raise FileNotFoundError(f"no codebooks under {path}")
    qdf = spark.createDataFrame([(0, query_vec)], ["vec_id", "embedding"])
    probes = [
        r["cell"] for r in probe_cells(qdf, centroids, n_probe).collect()
    ]
    codes = store.load(_PQ_DATASET).filter(F.col("cell").isin(probes))
    return adc_topk(codes, query_vec, books, k=k)
