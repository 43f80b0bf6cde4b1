"""Tokenizer/string-ops scale stress: WordPiece encode, edit-distance
join and Kneser-Ney scoring at sf-scale document volumes, with a
replication leg separating vocab-bound from corpus-bound cost.

Claims under test (the 100 TB posture of the round's new operators):

- wordpiece_encode_docs: after the word_counts dedup, every stage is
  VOCAB-bound — replicating the corpus R-fold (same vocabulary, R x rows)
  must cost ~the extra corpus scan only, not R x the greedy-loop work;
- edit_join_words: same dedup cut — the tiered prefix index is
  vocab-bound, so the pair count is IDENTICAL under replication and wall
  grows by the scan cost only;
- kn_nll_docs: genuinely corpus-bound (every document is scored), so the
  expectation is ~linear wall in rows — the baseline to compare the two
  vocab-bound claims against.

Usage: python scripts/tokenizer_stress.py [sf_dir] [replicas]
       (default /root/testdata/sf0.1, replicas 4)
Prints one JSON line per leg plus a summary.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from carrot_transform_spark.operators.editjoin import edit_join_words  # noqa: E402
from carrot_transform_spark.operators.ngram_lm import kn_nll_docs  # noqa: E402
from carrot_transform_spark.operators.wordpiece import (  # noqa: E402
    wordpiece_encode_docs,
)
from carrot_transform_spark.queries import load, release_query_caches  # noqa: E402
from carrot_transform_spark.session import get_spark  # noqa: E402


def _docs(spark, sf_dir: str, replicas: int):
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    if replicas > 1:
        r = spark.range(replicas).select(F.col("id").alias("rep"))
        d = d.crossJoin(r).select(
            (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"), "text"
        )
    return d


def _time(label: str, fn):
    t0 = time.time()
    n = fn()
    dt = round(time.time() - t0, 2)
    print(json.dumps({"leg": label, "rows": n, "wall_sec": dt}), flush=True)
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="tokenizer-stress")
    from carrot_transform_spark.queries import _QUERY_CACHES

    results: dict[str, float] = {}
    for tag, rep in (("base", 1), (f"x{replicas}", replicas)):
        d = _docs(spark, sf_dir, rep).persist()
        n_docs = d.count()
        print(f"--- {tag}: {n_docs} docs", flush=True)
        results[f"wp_{tag}"] = _time(
            f"wordpiece_{tag}",
            lambda: wordpiece_encode_docs(d, persist_registry=_QUERY_CACHES).count(),
        )
        release_query_caches()
        results[f"ej_{tag}"] = _time(
            f"editjoin_k2_{tag}", lambda: edit_join_words(d, k=2).count()
        )
        results[f"kn_{tag}"] = _time(
            f"kn_nll_{tag}", lambda: kn_nll_docs(d).count()
        )
        d.unpersist()

    summary = {
        "replicas": replicas,
        "wp_ratio": round(results[f"wp_x{replicas}"] / results["wp_base"], 2),
        "ej_ratio": round(results[f"ej_x{replicas}"] / results["ej_base"], 2),
        "kn_ratio": round(results[f"kn_x{replicas}"] / results["kn_base"], 2),
        "note": "wp/ej ratios should sit well under the replica factor "
        "(vocab-bound); kn is the corpus-bound baseline (~linear)",
    }
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
