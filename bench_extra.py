"""Round-6 optimization measurement harness (bench.py is FROZEN).

Isolates each headline query with the noop sink (guide §1.4), labels
jobs (§1.5), and optionally dumps .explain("formatted") to
plans/r06/<query>_<tag>.txt.

Usage:
    python bench_extra.py [--sf DIR] [--queries a,b,c] [--repeat N]
                          [--plans TAG] [--minhash-profile]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from oregonwaterdataportal_etl_spark.session import get_spark

HEADLINE = [
    "tpch1_agg",
    "filter_project",
    "two_hop_star_join",
    "lww_window",
    "cdc_lww_fold",
    "argmax_dedup",
    "month_histogram",
    "sessionization",
    "asof_join",
    "having_threshold",
    "token_stats",
    "exact_dedup_docs",
    "md5_fingerprint",
    "embedding_topk",
    "minhash_neardup",
]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def time_query(spark, fn, sf_dir):
    t0 = time.perf_counter()
    noop(fn(spark, sf_dir))
    return time.perf_counter() - t0


def minhash_profile(spark, sf_dir):
    """Stage-by-stage decomposition of q_minhash_neardup."""
    from pyspark.sql import functions as F

    from oregonwaterdataportal_etl_spark.operators import dedup

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    par = spark.sparkContext.defaultParallelism
    src = d.select("doc_id", "text")
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)

    out = {}

    # 1. shingling alone
    t0 = time.perf_counter()
    spark.sparkContext.setJobDescription("mh: shingles only")
    from oregonwaterdataportal_etl_spark.functions.text import shingles

    noop(src.select("doc_id", shingles("text", k=5).alias("s")))
    out["shingles_only"] = time.perf_counter() - t0

    # 2. shingles + md5 base hash
    t0 = time.perf_counter()
    spark.sparkContext.setJobDescription("mh: base hash")
    base = lambda s: F.pmod(dedup.md5_base_hash(s), F.lit(dedup.MD5_PRIME))  # noqa: E731
    noop(src.select("doc_id", F.transform(shingles("text", k=5), base).alias("h")))
    out["base_hash"] = time.perf_counter() - t0

    # 3. full signatures (32 families)
    t0 = time.perf_counter()
    spark.sparkContext.setJobDescription("mh: signatures")
    sig = dedup.minhash_signatures(src, "text", 32, 5, "md5").select(
        "doc_id", "minhash"
    )
    noop(sig)
    out["signatures"] = time.perf_counter() - t0

    # 4. full pipeline
    t0 = time.perf_counter()
    spark.sparkContext.setJobDescription("mh: full")
    noop(
        dedup.minhash_lsh_pairs(
            d, num_hashes=32, bands=8, jaccard_threshold=0.5, hash_family="md5"
        )
    )
    out["full"] = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=",".join(HEADLINE))
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dump explain to plans/r06/<q>_<TAG>.txt")
    ap.add_argument("--minhash-profile", action="store_true")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    if args.minhash_profile:
        prof = minhash_profile(spark, args.sf)
        for k, v in prof.items():
            print(f"  {k:>16}: {v:.3f}s")
        return

    names = [n for n in args.queries.split(",") if n]
    # warmup
    time_query(spark, qs["filter_project"], args.sf)
    for name in names:
        if args.plans:
            os.makedirs("plans/r06", exist_ok=True)
            df = qs[name](spark, args.sf)
            with open(f"plans/r06/{name}_{args.plans}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        draws = []
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(name)
            draws.append(round(time_query(spark, qs[name], args.sf), 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{name:>22}: {draws} min={min(draws):.3f}")


if __name__ == "__main__":
    sys.exit(main())
