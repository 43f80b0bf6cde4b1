"""Behavioral tests for the reusable operator library (operators/)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.operators import dedup as dd
from carrot_transform_spark.operators import similarity as sim
from carrot_transform_spark.operators import text as tx
from carrot_transform_spark.queries import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y"), (4, "A B C ")], "id long, text string"
    )
    out = {r["fingerprint"]: r for r in dd.exact_dedup_groups(df, "id", "text").collect()}
    # case/trim-normalized: ids 1,2,4 collapse
    assert sorted(r["n_copies"] for r in out.values()) == [1, 3]
    big = next(r for r in out.values() if r["n_copies"] == 3)
    assert big["canonical_id"] == 1


def test_minhash_lsh_dedup_finds_planted_neardups(docs):
    pairs = dd.minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.7).collect()
    assert len(pairs) > 0
    assert all(r["jaccard"] >= 0.7 for r in pairs)
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_simhash_hamming_pairs_shape(docs):
    sig = dd.simhash_signatures(docs, "doc_id", "text")
    assert sig.count() == docs.filter(F.length(F.trim("text")) > 0).count()
    # 64-bit signatures: both halves within 32-bit range, non-negative
    stats = sig.agg(
        F.min("sim_hi"), F.max("sim_hi"), F.min("sim_lo"), F.max("sim_lo")
    ).collect()[0]
    assert stats[0] >= 0 and stats[1] < 2**32
    assert stats[2] >= 0 and stats[3] < 2**32
    near = dd.hamming_pairs(sig, max_distance=8, prefix_bits=16)
    assert near.count() >= 0  # shape check; pair presence depends on buckets


def test_simhash_identical_docs_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different words entirely here now")],
        "doc_id long, text string",
    )
    sig = dd.simhash_signatures(df, "doc_id", "text")
    near = {(r["id_a"], r["id_b"]): r["hamming"]
            for r in dd.hamming_pairs(sig, max_distance=0, prefix_bits=16).collect()}
    assert near == {(1, 2): 0}


def test_simhash_bucket_skew_bounded(docs):
    """16-bit prefix blocking must spread the corpus: no bucket holds a
    large fraction of documents (8-bit blocking collapsed everything into
    <=256 buckets — giant self-joins at scale)."""
    sig = dd.simhash_signatures(docs, "doc_id", "text")
    buckets = (
        sig.withColumn("bucket", F.expr("sim_hi >> 16")).groupBy("bucket").count().collect()
    )
    n_docs = sum(r["count"] for r in buckets)
    max_bucket = max(r["count"] for r in buckets)
    assert max_bucket <= max(4, n_docs // 20), (n_docs, max_bucket)


def test_cosine_topk_self_similarity(emb):
    q = emb.filter(F.col("vec_id") < 3)
    out = sim.cosine_topk(emb, q, k=3).collect()
    assert len(out) == 9
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        sims = [r["cosine_sim"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != qid for r in rows)


def test_ivf_matches_bruteforce_within_cell(emb):
    q = emb.filter(F.col("vec_id") < 3)
    ivf = sim.ivf_topk(emb, q, cell_col="label", k=3).collect()
    # every IVF neighbor shares the query's cell
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    for r in ivf:
        assert labels[r["neighbor_id"]] == labels[r["query_id"]]


def test_assign_cells_centroids(emb):
    rows = emb.limit(4).collect()
    centroids = [list(r["embedding"]) for r in rows[:2]]
    out = {r["id"]: r["cell"] for r in sim.assign_cells(emb, centroids).collect()}
    # each centroid's own vector maps to itself
    assert out[rows[0]["vec_id"]] == 0
    assert out[rows[1]["vec_id"]] == 1


def test_text_operators(docs):
    d = docs.filter(F.length(F.trim("text")) > 0)
    flags = tx.quality_flags(F.col("text"))
    out = d.select("doc_id", *[v.alias(k) for k, v in flags.items()]).collect()
    assert all(r["n_tokens"] > 0 for r in out)
    assert all(0.0 <= r["alnum_ratio"] <= 1.0 for r in out)
    lid = d.select(tx.lang_id(F.col("text")).alias("l")).distinct().collect()
    assert {r["l"] for r in lid} <= {"en", "de", "fr", "es", "zh", "und"}
    wf = tx.word_frequencies(d, "text")
    assert wf.count() > 0


def test_time_band_join_keyless_matches_naive(spark):
    """Bucketized keyless band join == naive cross-join + band filter."""
    from carrot_transform_spark.operators.rangejoin import time_band_join

    left = spark.createDataFrame(
        [(i, f"2020-01-01 {h:02d}:00:00") for i, h in enumerate([0, 3, 6, 12, 23])],
        "lid long, lts string",
    ).select("lid", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(j, f"2020-01-01 {h:02d}:30:00") for j, h in enumerate(range(24))],
        "rid long, rts string",
    ).select("rid", F.col("rts").cast("timestamp").alias("rts"))

    got = {
        (r["lid"], r["rid"])
        for r in time_band_join(
            left, right, "lts", "rts", lower_s=-2 * 3600, upper_s=3600, how="inner"
        ).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.crossJoin(right)
        .filter(
            (F.col("rts") >= F.col("lts") - F.expr("INTERVAL 2 HOURS"))
            & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 1 HOUR"))
        )
        .collect()
    }
    assert got == naive and len(got) > 0


def test_time_band_join_keyed_left_keeps_unmatched(spark):
    from carrot_transform_spark.operators.rangejoin import time_band_join

    left = spark.createDataFrame(
        [(1, 10, "2020-01-01 10:00:00"), (2, 20, "2020-01-01 10:00:00")],
        "lid long, k long, lts string",
    ).select("lid", "k", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(100, 10, "2020-01-01 09:30:00")], "rid long, rk long, rts string"
    ).select("rid", "rk", F.col("rts").cast("timestamp").alias("rts"))
    out = time_band_join(
        left, right, "lts", "rts", lower_s=-3600, upper_s=0, keys=[("k", "rk")], how="left"
    ).collect()
    by_lid = {r["lid"]: r["rid"] for r in out}
    assert by_lid == {1: 100, 2: None}


def test_stratified_sample_deterministic_and_rated(spark):
    from carrot_transform_spark.operators.sampling import stratified_sample

    df = spark.range(20000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    kept1 = stratified_sample(df, "key", "lang", {"en": 0.25, "de": 0.75})
    kept2 = stratified_sample(df, "key", "lang", {"en": 0.25, "de": 0.75})
    # deterministic: identical subsets across runs/partitionings
    assert kept1.count() == kept2.count()
    s1 = {r["key"] for r in kept1.collect()}
    s2 = {r["key"] for r in kept2.repartition(7).collect()}
    assert s1 == s2
    rates = {
        r["lang"]: r["n"]
        for r in kept1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert abs(rates["en"] / 10000 - 0.25) < 0.03
    assert abs(rates["de"] / 10000 - 0.75) < 0.03


def test_ivf_multiprobe_recall_improves(emb):
    """n_probe = all cells must reproduce brute force exactly; n_probe=1
    equals the single-cell IVF on the same quantizer."""
    rows = emb.limit(3).collect()
    centroids = [list(r["embedding"]) for r in rows]
    q = emb.filter(F.col("vec_id") < 5)

    brute = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in sim.cosine_topk(emb, q, k=3).collect()
    }
    allprobe = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in sim.ivf_topk_multiprobe(emb, q, centroids, n_probe=len(centroids), k=3).collect()
    }
    assert allprobe == brute

    cells = sim.assign_cells(emb, centroids)
    corpus1 = emb.join(cells.withColumnRenamed("id", "vid"), F.col("vec_id") == F.col("vid")).drop("vid")
    one_cell = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in sim.ivf_topk(corpus1, corpus1.filter(F.col("vec_id") < 5), cell_col="cell", k=3).collect()
    }
    one_probe = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in sim.ivf_topk_multiprobe(emb, q, centroids, n_probe=1, k=3).collect()
    }
    assert one_probe == one_cell


def test_mix_datasets_hits_target_proportions(spark):
    from carrot_transform_spark.operators.sampling import mix_datasets

    a = spark.range(30000).select(F.col("id").alias("k"))   # over-represented
    b = spark.range(10000).select((F.col("id") + 100000).alias("k"))
    mixed = mix_datasets([(a, 1.0), (b, 1.0)], key_col="k", source_names=["a", "b"])
    by_src = {
        r["mix_source"]: r["n"]
        for r in mixed.groupBy("mix_source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # b is binding (keeps all); a downsamples to ~10000 for a 1:1 mix
    assert by_src["b"] == 10000
    assert abs(by_src["a"] - 10000) < 400
    # deterministic across invocations
    again = mix_datasets([(a, 1.0), (b, 1.0)], key_col="k", source_names=["a", "b"])
    assert again.count() == mixed.count()


def test_time_band_join_keyless_left_matches_naive(spark):
    """Keyless how='left' == naive left join on the band predicate: matched
    rows get no spurious null-extended twin, unmatched rows get exactly one
    null row (regression: pre-fix, the 2-bucket explode emitted both)."""
    from carrot_transform_spark.operators.rangejoin import time_band_join

    left = spark.createDataFrame(
        # h=23 has matches only in its own bucket; h=12 matches both buckets;
        # lid=9 sits outside every right ts -> unmatched
        [(0, "2020-01-01 00:00:00"), (1, "2020-01-01 12:00:00"),
         (2, "2020-01-01 23:00:00"), (9, "2020-06-01 00:00:00")],
        "lid long, lts string",
    ).select("lid", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(j, f"2020-01-01 {h:02d}:30:00") for j, h in enumerate(range(24))],
        "rid long, rts string",
    ).select("rid", F.col("rts").cast("timestamp").alias("rts"))

    out = time_band_join(
        left, right, "lts", "rts", lower_s=-2 * 3600, upper_s=3600, how="left"
    ).collect()
    got = sorted((r["lid"], r["rid"]) for r in out)
    naive = sorted(
        (r["lid"], r["rid"])
        for r in left.join(
            right,
            (F.col("rts") >= F.col("lts") - F.expr("INTERVAL 2 HOURS"))
            & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 1 HOUR")),
            "left",
        ).collect()
    )
    assert got == naive
    assert (9, None) in got and got.count((9, None)) == 1


def test_time_band_join_keyless_rejects_bad_inputs(spark):
    from carrot_transform_spark.operators.rangejoin import time_band_join

    l = spark.createDataFrame([(1, "2020-01-01 00:00:00")], "lid long, lts string")
    r = spark.createDataFrame([(2, "2020-01-01 00:10:00")], "rid long, rts string")
    with pytest.raises(ValueError, match="how="):
        time_band_join(l, r, "lts", "rts", -60, 60, how="right")
    shared = r.withColumnRenamed("rid", "lid")
    with pytest.raises(ValueError, match="disjoint"):
        time_band_join(l, shared, "lts", "rts", -60, 60, how="inner")


def test_mix_datasets_edge_inputs(spark):
    from carrot_transform_spark.operators.sampling import mix_datasets

    a = spark.range(1000).select(F.col("id").alias("k"))
    empty = spark.range(0).select(F.col("id").alias("k"))
    # an empty part with positive weight must not zero the other sources
    mixed = mix_datasets([(a, 1.0), (empty, 1.0)], key_col="k", source_names=["a", "e"])
    by_src = {
        r["mix_source"]: r["n"]
        for r in mixed.groupBy("mix_source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_src == {"a": 1000}  # binding source keeps every row, exactly
    # nothing mixable at all -> explicit error, not a silently empty frame
    with pytest.raises(ValueError, match="zero weight or zero rows"):
        mix_datasets([(a, 0.0), (empty, 1.0)], key_col="k")


def test_hamming_pairs_narrow_signature_buckets(spark):
    """bits<=32 signatures block on sim_lo (sim_hi is degenerate); bad
    prefix_bits raise instead of shifting negatively / one-bucketing."""
    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta token{i}") for i in range(8)]
        + [(100, "alpha beta gamma delta token0")],  # near-dup of id 0
        "id long, text string",
    )
    sig32 = dd.simhash_signatures(df, "id", "text", bits=32)
    assert all(r["sim_hi"] == 0 for r in sig32.collect())
    pairs = dd.hamming_pairs(sig32, max_distance=2, prefix_bits=16, bits=32)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 100) in got
    # the width travels in column metadata: omitting bits must derive 32
    # (not silently one-bucket on the degenerate hi half)
    auto = {(r["id_a"], r["id_b"]) for r in dd.hamming_pairs(
        sig32, max_distance=2, prefix_bits=16).collect()}
    assert auto == got
    with pytest.raises(ValueError, match="prefix_bits"):
        dd.hamming_pairs(sig32, prefix_bits=0)
    with pytest.raises(ValueError, match="exceeds"):
        dd.hamming_pairs(dd.simhash_signatures(df, "id", "text", bits=16),
                         prefix_bits=20, bits=16)
    with pytest.raises(ValueError, match="exceeds"):
        dd.hamming_pairs(dd.simhash_signatures(df, "id", "text", bits=16),
                         prefix_bits=20)


def test_chunk_token_windows_boundaries(spark):
    """Window math: short doc -> one short chunk; long doc -> overlapping
    windows that cover every token; final chunk unpadded."""
    from carrot_transform_spark.operators.chunking import chunk_token_windows

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, "only three words"), (2, words), (3, "   ")], "id long, text string"
    )
    out = chunk_token_windows(df, "id", "text", size=4, overlap=1).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    assert 3 not in by_id  # blank doc dropped
    assert len(by_id[1]) == 1 and by_id[1][0]["chunk_text"] == "only three words"
    # 10 tokens, size 4, step 3 -> chunks at 0,3,6,9: 1 + ceil(6/3) = 3? no:
    # 1 + ceil((10-4)/3) = 1 + 2 = 3 chunks, last = w6..w9 (4 tokens)
    chunks = sorted(by_id[2], key=lambda r: r["chunk_idx"])
    assert [c["chunk_text"] for c in chunks] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9",
    ]
    # every token covered
    covered = set(" ".join(c["chunk_text"] for c in chunks).split())
    assert covered == set(words.split())
    with pytest.raises(ValueError, match="overlap"):
        chunk_token_windows(df, "id", "text", size=4, overlap=4)


def test_connected_components_groups(spark):
    from carrot_transform_spark.operators.dedup import connected_components

    # two components: {1,2,3,4} via chain, {10,11}; 20-20 self-pair edge case absent
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = {r["id"]: r["component_id"] for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_star_matches_propagation(spark):
    import random

    from carrot_transform_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    random.seed(6)
    raw = [(random.randrange(120), random.randrange(120)) for _ in range(100)]
    pairs = spark.createDataFrame(
        [p for p in raw if p[0] != p[1]], "id_a long, id_b long"
    )
    a = {r["id"]: r["component_id"] for r in connected_components(pairs).collect()}
    b = {r["id"]: r["component_id"] for r in connected_components_star(pairs).collect()}
    assert a == b and len(a) > 50


def test_connected_components_star_chain_logarithmic_rounds(spark):
    from carrot_transform_spark.operators.dedup import connected_components_star

    # 200-link chain: diameter 200, far beyond max_iter=12 rounds — only the
    # O(log n) star contraction can converge; min-propagation would need 200
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a long, id_b long"
    )
    out = {
        r["id"]: r["component_id"]
        for r in connected_components_star(chain, max_iter=12).collect()
    }
    assert len(out) == 201 and set(out.values()) == {0}


def test_connected_components_union_input_no_constraint_crash(spark):
    import pyspark.sql.functions as F

    from carrot_transform_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    # edge list built as a UNION of two derived frames: localCheckpoint used
    # to capture the union's constraint set into the LogicalRDD, and the
    # loop's next Union crashed in rewriteConstraints ("key not found") —
    # this pins the constraint-propagation scope fix
    chain = spark.range(50).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    stars = spark.range(10).select(
        (F.lit(100) + F.col("id") * 2).alias("id_a"),
        (F.lit(101) + F.col("id") * 2).alias("id_b"),
    )
    pairs = chain.unionByName(stars)
    a = {r["id"]: r["component_id"] for r in connected_components_star(pairs).collect()}
    assert len(a) == 71 and sum(1 for v in a.values() if v == 0) == 51
    b = {r["id"]: r["component_id"] for r in connected_components(pairs).collect()}
    assert a == b
    # the conf is restored after the operators return
    assert spark.conf.get("spark.sql.constraintPropagation.enabled") == "true"


def test_connected_components_deep_diameter_no_plan_blowup(spark):
    from carrot_transform_spark.operators.dedup import connected_components

    # 30 propagation rounds: before the per-round localCheckpoint, lineage
    # doubled every round and rendering the AQE plan string alone OOM'd the
    # driver past ~15 rounds — this pins the fix
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    out = {r["id"]: r["component_id"] for r in connected_components(chain).collect()}
    assert len(out) == 31 and set(out.values()) == {0}


def test_cms_estimates_bound_exact_counts(spark):
    import pyspark.sql.functions as F

    from carrot_transform_spark.operators.freqitems import cms_build, cms_estimate

    # 3 items with known counts, tiny sketch (width 8 forces some collisions)
    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 5
    df = spark.createDataFrame(rows, "w string")
    cms = cms_build(df, "w", width=8, depth=4)
    est = {
        r["w"]: r["cms_est"]
        for r in cms_estimate(cms, df, "w", width=8, depth=4).collect()
    }
    exact = {"a": 50, "b": 30, "c": 5}
    for w, n in exact.items():
        # CMS never undercounts; overshoot bounded by total mass
        assert n <= est[w] <= n + 85 - n, (w, n, est[w])
    # cell table never exceeds depth*width regardless of cardinality
    assert cms.count() <= 4 * 8


def test_cms_partition_invariant(spark):
    from carrot_transform_spark.operators.freqitems import cms_build

    rows = [(f"w{i % 17}",) for i in range(500)]
    df = spark.createDataFrame(rows, "w string")
    a = sorted(map(tuple, cms_build(df.coalesce(1), "w", width=64, depth=4).collect()))
    b = sorted(map(tuple, cms_build(df.repartition(16), "w", width=64, depth=4).collect()))
    assert a == b


def test_decontaminate_flags_overlapping_docs(spark):
    from carrot_transform_spark.operators.dedup import decontaminate, exploded_shingle_index

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # copies bench 100
            (2, "completely different words in this row entirely"),
        ],
        "id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps high")], "id long, text string"
    )
    ci = exploded_shingle_index(corpus, "id", "text")
    bi = exploded_shingle_index(bench, "id", "text")
    out = {r["doc_id"]: (r["n_hits"], r["n_bench_docs"]) for r in decontaminate(ci, bi, min_hits=2).collect()}
    assert 1 in out and out[1][0] >= 2 and out[1][1] == 1
    assert 2 not in out


def test_pack_chunks_bins(spark):
    from carrot_transform_spark.operators.chunking import chunk_token_windows, pack_chunks

    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words)], "id long, text string")
    chunks = chunk_token_windows(df, "id", "text", size=10, overlap=0)
    packed = pack_chunks(chunks, budget=25).orderBy("chunk_idx").collect()
    # 10 chunks of 10 tokens, budget 25: cumsum-before = 0,10,20,30,... ->
    # bins 0,0,0,1,1,2,2,2,3,3 with offsets (before % 25)
    assert [r["bin_idx"] for r in packed] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    assert [r["bin_offset"] for r in packed] == [0, 10, 20, 5, 15, 0, 10, 20, 5, 15]
    # per-doc window: a second doc packs independently from bin 0
    df2 = spark.createDataFrame([(1, words), (2, words)], "id long, text string")
    packed2 = pack_chunks(chunk_token_windows(df2, "id", "text", size=10, overlap=0), budget=25)
    firsts = {r["id"]: r["bin_idx"] for r in packed2.filter(F.col("chunk_idx") == 0).collect()}
    assert firsts == {1: 0, 2: 0}


def test_repetition_profile_metrics(spark):
    from carrot_transform_spark.operators.repetition import repetition_profile

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y z w")], "doc_id long, text string"
    )
    out = {r["doc"]: r for r in repetition_profile(df).collect()}
    # doc 1: 4 tokens, 2 distinct -> dup_word_frac 0.5; top word 'a' 3/4;
    # bigrams (a a),(a a),(a b) -> top 2/3
    assert out[1]["n_tokens"] == 4
    assert out[1]["dup_word_frac"] == pytest.approx(0.5)
    assert out[1]["top_word_frac"] == pytest.approx(0.75)
    assert out[1]["top_bigram_frac"] == pytest.approx(2 / 3)
    # doc 2: all distinct
    assert out[2]["dup_word_frac"] == pytest.approx(0.0)
    assert out[2]["top_word_frac"] == pytest.approx(0.25)
    assert out[2]["top_bigram_frac"] == pytest.approx(1 / 3)


def test_span_dup_profile_cross_doc_only(spark):
    from carrot_transform_spark.operators.repetition import span_dup_profile

    shared = " ".join(f"s{i}" for i in range(8))
    df = spark.createDataFrame(
        [
            (1, shared + " " + " ".join(f"a{i}" for i in range(8))),
            (2, shared + " " + " ".join(f"b{i}" for i in range(8))),
            # doc 3 repeats ITS OWN span twice -> not a cross-doc dup
            (3, " ".join(f"c{i}" for i in range(8)) * 2),
        ],
        "doc_id long, text string",
    )
    out = {r["doc"]: r for r in span_dup_profile(df, span=8, stride=8).collect()}
    assert out[1]["n_dup_spans"] == 1 and out[1]["n_spans"] == 2
    assert out[2]["n_dup_spans"] == 1
    assert out[3]["n_dup_spans"] == 0


def test_tfidf_weights_and_cosine(spark):
    from carrot_transform_spark.operators.tfidf import cosine_pairs, tfidf_weights

    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "apple banana apple"), (3, "cherry date elder")],
        "doc_id long, text string",
    )
    w = tfidf_weights(df, idf_mode="log")
    # identical docs -> cosine 1; disjoint docs share no terms -> no pair row
    pairs = {(r["doc_a"], r["doc_b"]): r["cosine"] for r in cosine_pairs(w, 0.0).collect()}
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # max_df drops ubiquitous terms
    w2 = tfidf_weights(df, idf_mode="log", max_df=1)
    assert w2.filter(F.col("term") == "apple").count() == 0
    with pytest.raises(ValueError):
        tfidf_weights(df, idf_mode="bogus")


def test_kmeans_lloyd_separable(spark):
    from carrot_transform_spark.operators.kmeans import lloyd

    # two tight clusters around (0,0) and (10,10); seeds = first 2 ids,
    # one from each cluster
    pts = [
        (0, [0.1, 0.0]), (1, [10.0, 10.1]), (2, [0.0, 0.2]), (3, [9.9, 10.0]),
        (4, [0.2, 0.1]), (5, [10.1, 9.9]),
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    final, cents = lloyd(df, k=2, iters=2)
    cells = {r["id"]: r["cell"] for r in final.collect()}
    assert cells[0] == cells[2] == cells[4]
    assert cells[1] == cells[3] == cells[5]
    assert cells[0] != cells[1]
    # centroids are the cluster means (rounded to 6 decimals)
    assert cents[cells[0]][0] == pytest.approx(0.1, abs=1e-6)
    assert cents[cells[1]][0] == pytest.approx(10.0, abs=1e-6)


def test_cdc_latest_snapshot_semantics(spark):
    from datetime import datetime
    from carrot_transform_spark.operators.cdc import latest_snapshot

    rows = [
        # key 1: update at t2 wins over t1
        (1, 1, datetime(2024, 1, 1), "upsert", 1.0),
        (2, 1, datetime(2024, 1, 2), "upsert", 2.0),
        # key 2: winning change is a delete -> key vanishes
        (3, 2, datetime(2024, 1, 1), "upsert", 3.0),
        (4, 2, datetime(2024, 1, 3), "delete", 0.0),
        # key 3: same ts twice -> higher change id wins (deterministic replay)
        (5, 3, datetime(2024, 1, 1), "upsert", 5.0),
        (6, 3, datetime(2024, 1, 1), "upsert", 6.0),
    ]
    df = spark.createDataFrame(
        rows, "change_id long, k long, ts timestamp, op string, v double"
    )
    out = {
        r["k"]: r
        for r in latest_snapshot(
            df, ["k"], "ts", "change_id", tombstone=F.col("op") == "delete"
        ).collect()
    }
    assert out[1]["v"] == 2.0
    assert 2 not in out
    assert out[3]["change_id"] == 6


def test_funnel_steps_first_touch(spark):
    from datetime import datetime
    from carrot_transform_spark.operators.funnel import funnel_steps

    t = lambda h: datetime(2024, 1, 1, h)
    rows = [
        # u1 converts fully: view@1 < click@2 < buy@3
        (1, "view", t(1)), (1, "click", t(2)), (1, "buy", t(3)),
        # u2 clicked BEFORE first view -> stops at step 1
        (2, "click", t(1)), (2, "view", t(2)), (2, "buy", t(3)),
        # u3 view only
        (3, "view", t(5)),
        # u4 never viewed -> counted nowhere
        (4, "buy", t(1)),
    ]
    df = spark.createDataFrame(rows, "u long, et string, ts timestamp")
    out = {r["step_idx"]: r["n_users"] for r in
           funnel_steps(df, "u", "et", "ts", ["view", "click", "buy"]).collect()}
    assert out == {1: 3, 2: 1, 3: 1}


def test_retention_cohorts_buckets(spark):
    from datetime import datetime
    from carrot_transform_spark.operators.retention import retention_cohorts

    rows = [
        # u1 first active day 0, again day 8 (offset 1), day 15 (offset 2)
        (1, datetime(1970, 1, 1)), (1, datetime(1970, 1, 9)), (1, datetime(1970, 1, 16)),
        # u2 first active day 8 (cohort week 1), again day 9 (same period)
        (2, datetime(1970, 1, 9)), (2, datetime(1970, 1, 10)),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    out = {(str(r["cohort_start"]), r["period_offset"]): r["n_users"]
           for r in retention_cohorts(df, "u", "ts", period_days=7).collect()}
    assert out == {
        ("1970-01-01", 0): 1, ("1970-01-01", 1): 1, ("1970-01-01", 2): 1,
        ("1970-01-08", 0): 1,
    }


def test_salted_join_matches_plain(spark, sf_dir):
    from carrot_transform_spark.operators.skewjoin import salted_join

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = sorted(
        (r["o_orderkey"], r["c_name"])
        for r in o.join(c, "o_custkey").select("o_orderkey", "c_name").collect()
    )
    salted = sorted(
        (r["o_orderkey"], r["c_name"])
        for r in salted_join(o, c, on="o_custkey", salt_key="o_orderkey", n_salts=4)
        .select("o_orderkey", "c_name").collect()
    )
    assert salted == plain
    # left join keeps unmatched big-side rows exactly once
    c_half = c.filter(F.col("o_custkey") % 2 == 0)
    plain_l = o.join(c_half, "o_custkey", "left").count()
    salted_l = salted_join(o, c_half, on="o_custkey", salt_key="o_orderkey",
                           n_salts=4, how="left").count()
    assert salted_l == plain_l


def test_bloom_semijoin_exact(spark, sf_dir):
    from carrot_transform_spark.operators.bloom import bloom_semi_join

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    expect = sorted(
        r["o_orderkey"]
        for r in o.join(
            c.select(F.col("c_custkey").alias("o_custkey")).distinct(), "o_custkey", "left_semi"
        ).collect()
    )
    # tiny bitmap forces false positives; the exact join must still remove them
    got = sorted(
        r["o_orderkey"]
        for r in bloom_semi_join(o, c, "o_custkey", "c_custkey", k=3, m_bits=256).collect()
    )
    assert got == expect and len(got) > 0


def test_hash_split_deterministic_and_partition_invariant(spark):
    from carrot_transform_spark.operators.sampling import hash_split

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r["k"]: r["split"] for r in
         hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    b = {r["k"]: r["split"] for r in
         hash_split(df.repartition(13), "k", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert a == b
    from collections import Counter
    frac = Counter(a.values())
    assert abs(frac["train"] / 2000 - 0.8) < 0.05
    assert set(frac) == {"train", "val", "test"}
    # every row assigned exactly once
    assert len(a) == 2000


def test_pagerank_properties(spark):
    from carrot_transform_spark.operators.pagerank import pagerank

    # star graph: everyone points at hub 0; hub points at node 1
    n = 50
    edges = [(i, 0) for i in range(1, n)] + [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = {r["node"]: r["rank"] for r in pagerank(df, iters=10).collect()}
    # mass conservation (within rounding); the hub and its sole successor
    # (which receives the hub's whole concentrated mass) dominate the leaves
    assert abs(sum(ranks.values()) - 1.0) < 1e-5
    assert ranks[0] > ranks[2] and ranks[1] > ranks[0]
    assert all(abs(ranks[i] - ranks[2]) < 1e-12 for i in range(3, n))
    # partition-invariant: same result from a different layout
    ranks2 = {r["node"]: r["rank"] for r in pagerank(df.repartition(7), iters=10).collect()}
    assert ranks2 == ranks


def test_pq_recall_and_compression(spark, emb):
    from carrot_transform_spark.operators import pq

    corpus = emb.limit(200)
    dim = len(corpus.select("embedding").first()[0])
    m = 4 if dim % 4 == 0 else 2
    books = pq.train_codebooks(corpus, m=m, k_sub=8, iters=2)
    assert len(books) == m and all(len(b) == 8 for b in books)
    codes = pq.encode(corpus, books).persist()
    rows = codes.collect()
    assert all(len(r["code"]) == m for r in rows)
    assert all(0 <= c < 8 for r in rows for c in r["code"])

    # recall@10 of ADC vs exact L2 for one query vector
    q = corpus.orderBy("vec_id").first()
    qv = [float(x) for x in q["embedding"]]
    got = {r["neighbor_id"] for r in pq.adc_topk(codes, qv, books, k=10).collect()}
    v = F.col("embedding").cast("array<double>")
    exact_dist = F.aggregate(
        F.zip_with(v, F.array(*[F.lit(x) for x in qv]), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    exact = {
        r["vec_id"]
        for r in corpus.select("vec_id", exact_dist.alias("d"))
        .orderBy("d", "vec_id").limit(10).collect()
    }
    # PQ is lossy; require meaningful overlap with the exact top-10
    assert len(got & exact) >= 4
    # determinism: re-encoding from a different layout gives identical codes
    codes2 = {r["id"]: r["code"] for r in pq.encode(corpus.repartition(7), books).collect()}
    assert codes2 == {r["id"]: r["code"] for r in rows}
    codes.unpersist()


def test_semantic_dedup_keep_list(spark):
    from carrot_transform_spark.operators import semdedup as sd

    # two clusters of identical vectors + one singleton; cell separates 10/20
    rows = [
        (1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0), (3, [0.99, 0.01], 0),
        (10, [0.0, 1.0], 1), (11, [0.0, 1.0], 1),
        (20, [-1.0, 0.5], 1),  # same cell as 10/11 but far in cosine
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, cell int")
    out = {r["id"]: r for r in sd.semantic_dedup(df, cell_col="cell", threshold=0.95).collect()}
    assert len(out) == 6  # exactly one row per input
    assert out[1]["component_id"] == 1 and out[1]["keep"] == 1
    assert out[2]["component_id"] == 1 and out[2]["keep"] == 0
    assert out[3]["component_id"] == 1 and out[3]["keep"] == 0
    assert out[10]["keep"] == 1 and out[11]["component_id"] == 10
    assert out[20]["component_id"] == 20 and out[20]["keep"] == 1  # singleton keeps itself
    # star variant produces identical groups
    star = {r["id"]: tuple(r) for r in
            sd.semantic_dedup(df, cell_col="cell", threshold=0.95, star=True).collect()}
    assert star == {r["id"]: tuple(r) for r in out.values()}


def test_semantic_dedup_blocks_by_cell(spark):
    from carrot_transform_spark.operators import semdedup as sd

    # identical vectors in DIFFERENT cells must NOT pair (blocking contract)
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 1)],
        "vec_id long, embedding array<double>, cell int",
    )
    out = {r["id"]: r for r in sd.semantic_dedup(df, cell_col="cell", threshold=0.9).collect()}
    assert out[1]["keep"] == 1 and out[2]["keep"] == 1


def test_semantic_dedup_centroid_path(spark):
    from carrot_transform_spark.operators import semdedup as sd

    # no cell column: blocking comes from nearest-centroid assignment
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.98, 0.02]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    out = {r["id"]: r for r in sd.semantic_dedup(df, centroids=cents, threshold=0.95).collect()}
    assert out[2]["component_id"] == 1 and out[2]["keep"] == 0
    assert out[3]["keep"] == 1


def test_quality_filter_chain_rules_and_attribution(spark):
    from carrot_transform_spark.operators.quality import quality_filter_chain

    long_clean = "the " + " ".join(f"w{i}" for i in range(30))  # 31 tokens, has ' the '
    short = "tiny doc here"
    repeated = "the " + ("dup " * 30).strip()  # dup_word_frac near 1
    df = spark.createDataFrame(
        [(1, long_clean), (2, short), (3, repeated)], "doc_id long, text string"
    )
    out = {r["doc"]: r for r in
           quality_filter_chain(df, min_tokens=5, max_tokens=50).collect()}
    assert out[1]["keep"] == 1 and out[1]["reject_reasons"] == ""
    assert out[2]["keep"] == 0 and "too_short" in out[2]["reject_reasons"]
    assert "no_stopword" in out[2]["reject_reasons"]  # multi-rule attribution
    assert out[3]["keep"] == 0 and out[3]["reject_reasons"] == "dup_words"
    # rule order in the CSV is fixed (chain order, not alphabetical)
    assert out[2]["reject_reasons"] == "too_short,no_stopword"


def test_quality_filter_chain_one_row_per_doc(spark, docs):
    from carrot_transform_spark.operators.quality import quality_filter_chain

    out = quality_filter_chain(docs)
    assert out.count() == docs.count()
    assert out.select("doc").distinct().count() == docs.count()


def test_curriculum_sample_buckets_and_rates(spark):
    from carrot_transform_spark.operators.sampling import curriculum_sample

    # 400 rows, scores 0..399 -> quartile buckets by score descent
    df = spark.createDataFrame([(i, i % 400) for i in range(400)], "doc_id long, score int")
    out = curriculum_sample(df, "score", "doc_id", n_buckets=4)
    rows = out.collect()
    assert len(rows) == 400
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert sorted(by_bucket) == [1, 2, 3, 4]
    # score order respected: every bucket-1 score > every bucket-2 score, etc.
    for hi, lo in [(1, 2), (2, 3), (3, 4)]:
        assert min(r["score"] for r in by_bucket[hi]) > max(r["score"] for r in by_bucket[lo])
    # bucket 1 keeps everything (rate 1.0); lower buckets keep progressively less
    kept = {b: sum(r["sampled"] for r in rs) / len(rs) for b, rs in by_bucket.items()}
    assert kept[1] == 1.0
    assert kept[2] > kept[4]
    # deterministic + partition-invariant
    again = {(r["doc_id"], r["bucket"], r["sampled"])
             for r in curriculum_sample(df.repartition(7), "score", "doc_id").collect()}
    assert again == {(r["doc_id"], r["bucket"], r["sampled"]) for r in rows}


def test_curriculum_sample_ties_share_bucket(spark):
    from carrot_transform_spark.operators.sampling import curriculum_sample

    # all rows share one score -> all land in bucket 1 (start_frac = 0)
    df = spark.createDataFrame([(i, 5) for i in range(40)], "doc_id long, score int")
    out = curriculum_sample(df, "score", "doc_id", n_buckets=4).collect()
    assert {r["bucket"] for r in out} == {1}
    assert all(r["sampled"] == 1 for r in out)  # bucket 1 keeps everything


def test_sample_exact_n_contracts(spark):
    """Exact count, determinism under partitioning, prefix stability as n
    grows, and the n >= |df| / n = 0 edges."""
    from carrot_transform_spark.operators.sampling import sample_exact_n

    df = spark.createDataFrame([(i, f"d{i}") for i in range(500)], "k long, v string")

    s100 = {r["k"] for r in sample_exact_n(df, "k", 100).collect()}
    assert len(s100) == 100
    # deterministic + partition-invariant
    s100b = {r["k"] for r in sample_exact_n(df.repartition(13), "k", 100).collect()}
    assert s100b == s100
    # prefix-stable: growing n keeps every earlier pick
    s250 = {r["k"] for r in sample_exact_n(df, "k", 250).collect()}
    assert s100 < s250
    # salt decorrelates
    other = {r["k"] for r in sample_exact_n(df, "k", 100, salt="other").collect()}
    assert other != s100
    # edges
    assert sample_exact_n(df, "k", 10_000).count() == 500
    assert sample_exact_n(df, "k", 0).count() == 0
    # plan shape: distributed partial top-N, not a global sort
    plan = sample_exact_n(df, "k", 100)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_sample_exact_n_weighted_contracts(spark):
    """Exact count, determinism/partition invariance, weight-proportional
    inclusion across independent salts, w<=0 ineligibility, plan shape."""
    from carrot_transform_spark.operators.sampling import sample_exact_n_weighted

    rows = [(i, "heavy" if i % 10 == 0 else "light", 9.0 if i % 10 == 0 else 1.0)
            for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, cls string, w double")

    s = sample_exact_n_weighted(df, "k", "w", 200)
    got = {r["k"] for r in s.collect()}
    assert len(got) == 200
    got_b = {r["k"] for r in
             sample_exact_n_weighted(df.repartition(17), "k", "w", 200).collect()}
    assert got_b == got

    # inclusion-probability law: 100 heavy rows at w=9 vs 900 light at w=1.
    # Across 30 independent salts, heavy rows must be sampled at several
    # times the light rate (exact A-ES odds are order-statistics, but a
    # 9x weight at this n gives a wide, test-stable margin).
    heavy_rate = light_rate = 0
    for t in range(30):
        picked = {r["k"] for r in
                  sample_exact_n_weighted(df, "k", "w", 200, salt=f"s{t}").collect()}
        heavy_rate += len([k for k in picked if k % 10 == 0])
        light_rate += len([k for k in picked if k % 10 != 0])
    heavy_rate /= 30 * 100   # mean fraction of heavy rows included
    light_rate /= 30 * 900
    assert heavy_rate > 2.5 * light_rate, (heavy_rate, light_rate)

    # w <= 0 rows are ineligible; result shrinks to the eligible count
    dz = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -4.0), (4, 2.0)], "k long, w double"
    )
    kept = {r["k"] for r in sample_exact_n_weighted(dz, "k", "w", 10).collect()}
    assert kept == {1, 4}

    plan = sample_exact_n_weighted(df, "k", "w", 50)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_bloom_public_probe_api(spark):
    """The documented probe-side API: with_bitmap + bloom_might_contain as a
    plain (df -> filtered df) pair, no bloom_semi_join wrapper. Also pins
    the loud TypeError for the pre-r16 call shape that passed the bitmap
    list directly into the predicate (it silently read a magic column)."""
    import pytest as _pytest

    from carrot_transform_spark.operators.bloom import (
        DEFAULT_WORDS_COL,
        bloom_build,
        bloom_might_contain,
        with_bitmap,
    )

    build = spark.range(0, 50).selectExpr("id AS k")
    probe = spark.range(0, 500).selectExpr("id AS k")
    bitmap = bloom_build(build, "k", k=3, m_bits=4096)
    kept = (
        with_bitmap(probe, bitmap)
        .filter(bloom_might_contain(F.col("k"), k=3, m_bits=4096))
        .drop(DEFAULT_WORDS_COL)
    )
    got = {r["k"] for r in kept.collect()}
    # no false negatives: every build key survives the probe filter
    assert set(range(50)) <= got
    # the filter actually prunes (4096 bits over 50 keys -> tiny FP rate)
    assert len(got) < 500
    # custom words column name works end to end
    kept2 = (
        with_bitmap(probe, bitmap, words_col="wc")
        .filter(bloom_might_contain(F.col("k"), k=3, m_bits=4096, words_col="wc"))
        .drop("wc")
    )
    assert {r["k"] for r in kept2.collect()} == got
    # old call shape (bitmap as 2nd positional) fails loudly, not at analysis
    with _pytest.raises(TypeError, match="with_bitmap"):
        bloom_might_contain(F.col("k"), bitmap)


def test_constraint_propagation_toggle_threadsafe(spark):
    """The suite thread pool runs conf-toggling builders concurrently; the
    refcounted context manager must keep the conf OFF while any scope is
    live and restore the ORIGINAL value only when the last scope exits."""
    import threading
    import time

    from carrot_transform_spark.operators.dedup import _constraint_propagation_off

    key = "spark.sql.constraintPropagation.enabled"
    orig = spark.conf.get(key, "true")
    inside_values: list[str] = []
    barrier = threading.Barrier(3)

    def worker():
        with _constraint_propagation_off(spark):
            barrier.wait(timeout=10)  # all three scopes live at once
            inside_values.append(spark.conf.get(key))
            time.sleep(0.05)
        # after MY exit the conf may still be off (others live) but must
        # never be left 'false' once all exit — checked below

    threads = [threading.Thread(target=worker) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert inside_values == ["false", "false", "false"]
    assert spark.conf.get(key) == orig
    # nested use on one thread restores correctly too
    with _constraint_propagation_off(spark):
        assert spark.conf.get(key) == "false"
        with _constraint_propagation_off(spark):
            assert spark.conf.get(key) == "false"
        assert spark.conf.get(key) == "false"
    assert spark.conf.get(key) == orig
