#!/usr/bin/env python
"""Scale-curve probe for the dedup/ANN family (SCALE.md evidence).

Runs the four headline near-dup/similarity operators on the base corpus
and on a content-distinct K× replica (operators/scaling.py), recording
wall time and output-pair counts.  Sound banding/indexing must show
~K× pair growth and far-sub-K² wall growth; quadratic pair growth means
an operator degenerated into all-pairs behavior.

Usage: python scale_probe.py [K]   (default K=10)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
Prints one JSON line per (operator, factor) and a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from market_data_ingestion_scraper_spark.operators.dedup import (  # noqa: E402
    jaccard_similarity_join,
    lsh_candidate_pairs,
    minhash_band_table,
    near_duplicates_vs_index,
    simhash_near_duplicates,
)
from market_data_ingestion_scraper_spark.operators.scaling import (  # noqa: E402
    replicate_corpus,
    replicate_embeddings,
)
from market_data_ingestion_scraper_spark.operators.similarity import (  # noqa: E402
    bucket_table,
    lsh_topk,
)
from market_data_ingestion_scraper_spark.session import get_spark  # noqa: E402
from market_data_ingestion_scraper_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale_probe")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    docs.count(), emb.count()  # warm the JVM before timing

    def ann(corpus):
        buckets = bucket_table(
            corpus, "vec_id", "embedding", n_planes=4, n_tables=8, dim=64,
            seed_base=1000,
        )
        return lsh_topk(
            corpus, corpus.filter(F.col("vec_id") < 8), k=5,
            corpus_buckets=buckets,
        )

    ops = {
        "minhash_lsh_candidates": lambda d, _e: lsh_candidate_pairs(
            d, portable=True
        ),
        "jaccard_ssjoin_near_dups": lambda d, _e: jaccard_similarity_join(d),
        "simhash_near_dups": lambda d, _e: simhash_near_duplicates(
            d, portable=True
        ),
        "lsh_topk_ann": lambda _d, e: ann(e),
    }

    from market_data_ingestion_scraper_spark.operators.similarity import (
        fit_pq_codebooks,
        pq_encode,
    )

    # fit once on the base corpus, untimed: the codebooks are the reusable
    # training artifact; the probe measures the per-corpus ENCODE pass
    codebooks = fit_pq_codebooks(emb)
    # fixed re-crawl shard for the incremental probe — factor-independent,
    # so serve cost vs index size is the only variable
    shard = docs.filter(F.col("doc_id") < 50)

    results: dict[str, dict[int, dict[str, float]]] = {}
    for factor in (1, k):
        d = replicate_corpus(docs, factor)
        e = replicate_embeddings(emb, factor)
        for name, fn in ops.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            pairs = fn(d, e).count()
            sec = round(time.perf_counter() - t0, 2)
            results.setdefault(name, {})[factor] = {"pairs": pairs, "sec": sec}
            print(json.dumps({"op": name, "factor": factor,
                              "pairs": pairs, "sec": sec}), flush=True)
        # r8: PQ corpus encode — one output row per vector, so pair growth
        # must be exactly K and wall far below K (broadcast codebook join)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = pq_encode(e, codebooks).count()
        sec = round(time.perf_counter() - t0, 2)
        results.setdefault("pq_encode", {})[factor] = {"pairs": n, "sec": sec}
        print(json.dumps({"op": "pq_encode", "factor": factor,
                          "pairs": n, "sec": sec}), flush=True)
        # r8: incremental near-dup serve of a FIXED shard against a K×
        # index (index build untimed — it is the amortized artifact).
        # Replicas are content-distinct, so flagged pairs stay CONSTANT
        # and serve wall must grow far below K.
        idx = minhash_band_table(d, portable=True).persist()
        idx.count()  # no clearCache before timing: the warm index IS the point
        t0 = time.perf_counter()
        flagged = near_duplicates_vs_index(
            shard, idx, threshold=0.5, portable=True
        ).count()
        sec = round(time.perf_counter() - t0, 2)
        results.setdefault("near_dup_vs_index", {})[factor] = {
            "pairs": flagged, "sec": sec,
        }
        print(json.dumps({"op": "near_dup_vs_index", "factor": factor,
                          "pairs": flagged, "sec": sec}), flush=True)
        idx.unpersist()

    summary = {
        name: {
            "pairs_growth": round(r[k]["pairs"] / max(r[1]["pairs"], 1), 2),
            "wall_growth": round(r[k]["sec"] / max(r[1]["sec"], 1e-9), 2),
            "linear_target": float(k),
        }
        for name, r in results.items()
    }
    print(json.dumps({"sf_dir": sf_dir, "k": k, "summary": summary}))


if __name__ == "__main__":
    main()
