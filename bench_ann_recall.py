"""ANN recall curves: lsh_topk / ivf_topk vs exact brute force.

The approximate paths are value-gated at full probe (ivf probes =
n_centroids reproduces brute force exactly — the driver oracle), but a
user tuning ``probes`` needs the recall-vs-scan-fraction trade-off.
This bench measures recall@k against the exact answer over a corpus
derived from the driver's embeddings table (replicated ANN_COPIES x
with vec_id offsets and a deterministic per-replica jitter so replicas
are near but not identical — bucket populations scale honestly), for
2-4 probe settings per index family, averaged over NQ deterministic
query vectors.

Outputs ONE JSON line; the headline table lives in BENCH.md §7.

Usage: python bench_ann_recall.py        # sf0.1 x10 = 20k vectors
       ANN_SF_DIR=/root/testdata/sf0.01 ANN_COPIES=1 python bench_ann_recall.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

SF_DIR = os.environ.get(
    "ANN_SF_DIR", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
)
COPIES = int(os.environ.get("ANN_COPIES", "10"))
CPUS = int(os.environ.get("ANN_CPUS", "32"))
NQ = int(os.environ.get("ANN_NQ", "20"))
K = int(os.environ.get("ANN_K", "10"))

LSH_BITS, LSH_SEED = 6, 7
LSH_PROBE_SETTINGS = (1, 3, 8, 16)
IVF_CENTROIDS, IVF_SEED = 16, 7
IVF_PROBE_SETTINGS = (1, 2, 4, 8)


def _query_vecs(dim: int) -> list[list[float]]:
    """Deterministic unit query vectors (same construction as the
    driver's lsh_topk query)."""
    out = []
    for i in range(NQ):
        rng = np.random.default_rng(123 + i)
        q = rng.standard_normal(dim)
        out.append([float(x) for x in q / np.linalg.norm(q)])
    return out


def _scaled_corpus(spark, dim: int):
    """COPIES replicas with offset ids; replicas i>0 get a bounded
    deterministic jitter (sin of id+component, ~5% of unit scale) so
    they are near-duplicates, not exact clones."""
    from pyspark.sql import functions as F

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    n = e.count()
    parts = []
    for i in range(COPIES):
        c = e.withColumn("vec_id", (F.col("vec_id") + F.lit(i * n)).cast("long"))
        if i > 0:
            c = c.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, j: x
                    + F.sin(F.col("vec_id") * 31 + j.cast("double") + i * 97)
                    * 0.05,
                ),
            )
        parts.append(c)
    out = parts[0]
    for c in parts[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from oregonwaterdataportal_etl_spark.operators.similarity import (
        add_hyperplane_bucket,
        brute_force_topk,
        ivf_assign,
        lsh_probe_buckets,
    )
    from oregonwaterdataportal_etl_spark.session import get_spark

    spark = get_spark(app_name="ann-recall", master=f"local[{CPUS}]")
    dim = len(
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .select("embedding").first()["embedding"]
    )
    corpus = _scaled_corpus(spark, dim)

    # index once per family (the persisted-layout analog: bucket/cell
    # assignment is a build-time cost, not a probe-time cost)
    lsh_corpus = add_hyperplane_bucket(
        corpus, "embedding", bits=LSH_BITS, seed=LSH_SEED, dim=dim
    ).persist()
    ivf_corpus, centroids = ivf_assign(
        corpus, "embedding", IVF_CENTROIDS, IVF_SEED
    )
    ivf_corpus = ivf_corpus.persist()
    n_rows = lsh_corpus.count()
    ivf_corpus.count()

    queries = _query_vecs(dim)
    exact = {}
    t0 = time.perf_counter()
    for qi, q in enumerate(queries):
        exact[qi] = set(
            r["vec_id"]
            for r in brute_force_topk(corpus, q, k=K).collect()
        )
    brute_sec = time.perf_counter() - t0

    out = {
        "metric": "ann_recall_at_k",
        "k": K,
        "corpus_rows": n_rows,
        "dim": dim,
        "n_queries": NQ,
        "copies": COPIES,
        "sf_dir": SF_DIR,
        "brute_force_sec_per_query": round(brute_sec / NQ, 3),
        "lsh": {"bits": LSH_BITS, "buckets": 2 ** LSH_BITS, "settings": {}},
        "ivf": {"n_centroids": IVF_CENTROIDS, "settings": {}},
    }

    for probes in LSH_PROBE_SETTINGS:
        hits, cand_total, sec_total = 0, 0, 0.0
        for qi, q in enumerate(queries):
            buckets = lsh_probe_buckets(q, LSH_BITS, LSH_SEED, probes)
            cands = lsh_corpus.filter(F.col("__bucket").isin(buckets))
            t0 = time.perf_counter()
            got = set(
                r["vec_id"] for r in brute_force_topk(cands, q, k=K).collect()
            )
            sec_total += time.perf_counter() - t0
            cand_total += cands.count()
            hits += len(got & exact[qi])
        out["lsh"]["settings"][str(probes)] = {
            "recall": round(hits / (NQ * K), 4),
            "scan_frac": round(cand_total / (NQ * n_rows), 4),
            "sec_per_query": round(sec_total / NQ, 3),
        }

    cents = np.asarray(centroids, dtype=np.float64)
    for probes in IVF_PROBE_SETTINGS:
        hits, cand_total, sec_total = 0, 0, 0.0
        for qi, q in enumerate(queries):
            qv = np.asarray(q)
            d = ((cents - qv[None, :]) ** 2).sum(axis=1)
            cells = [int(c) for c in d.argsort()[:probes]]
            cands = ivf_corpus.filter(F.col("__cell").isin(cells))
            t0 = time.perf_counter()
            got = set(
                r["vec_id"] for r in brute_force_topk(cands, q, k=K).collect()
            )
            sec_total += time.perf_counter() - t0
            cand_total += cands.count()
            hits += len(got & exact[qi])
        out["ivf"]["settings"][str(probes)] = {
            "recall": round(hits / (NQ * K), 4),
            "scan_frac": round(cand_total / (NQ * n_rows), 4),
            "sec_per_query": round(sec_total / NQ, 3),
        }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
