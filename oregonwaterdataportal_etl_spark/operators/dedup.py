"""Deduplication operators for large-scale corpus pipelines.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-dup — all expressed as DataFrame transforms whose heavy lifting
stays JVM-side (hash/array expressions); the only shuffles are the
groupBys/joins inherent to the algorithms.

Scale notes (100 TB):
- exact dedup: one hash-groupBy shuffle on a 64-bit fingerprint —
  near-perfectly distributed keys, AQE coalesces the tail;
- MinHash LSH: candidate generation is band-bucket explode + self-join
  on (band, bucket); bucket keys are uniform by construction, and the
  explode factor is `bands`, a constant. The final verify step only
  touches candidate pairs, never the full cross product;
- SimHash: 64-bit signatures; near-dup = identical band keys over
  4 x 16-bit chunks (Hamming <= 3-ish recall), verified by popcount.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles, word_ngrams


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fingerprints: list[Column] | None = None,
) -> DataFrame:
    """Exact dedup: keep the lowest-id document per identical text.
    Fingerprint first so the shuffle key is 16 bytes, not the document;
    then min(id) per fingerprint — one shuffle with map-side partial
    aggregation.

    The fingerprint is 128-bit by default (two independently-seeded
    xxhash64 limbs): a single 64-bit key silently merges DISTINCT
    documents once the corpus nears 10^9-10^10 (birthday bound n^2/2^65
    gives ~1.5M false merges at n=10^10); at 128 bits the expected
    collision count at n=10^10 is ~3e-19. ``fingerprints`` overrides the
    limb expressions (tests inject a deliberately-colliding first limb to
    prove the second one disambiguates)."""
    t = F.trim(F.col(text_col))
    if fingerprints is None:
        fingerprints = [F.xxhash64(t), F.xxhash64(t, F.lit(1))]
    fp_names = [f"__fp{i}" for i in range(len(fingerprints))]
    keep = (
        df.select(F.col(id_col), *[fp.alias(n) for fp, n in zip(fingerprints, fp_names)])
        .groupBy(*fp_names)
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, on=id_col, how="left_semi")


def minhash_signatures(
    df: DataFrame, text_col: str = "text", num_hashes: int = 64, k: int = 5
) -> DataFrame:
    """MinHash signature array per document: for each of num_hashes
    seeded hash functions, min over shingle hashes. Expression-only:
    transform(hashes, h -> array_min(transform(shingles, s ->
    xxhash64(s, seed=h))))."""
    # Hash every shingle to a long ONCE (the expensive string hash),
    # then derive the num_hashes families by re-hashing that LONG with
    # a per-family seed — integer-width xxhash64, ~30x cheaper than
    # re-hashing the string per family (and ANSI-safe: no overflow).
    def family(i):
        return lambda h: F.xxhash64(h, F.lit(i))

    out = df.withColumn(
        "__h", F.transform(shingles(text_col, k=k), lambda s: F.xxhash64(s))
    )
    sigs = F.array(
        *[
            F.array_min(F.transform(F.col("__h"), family(i)))
            for i in range(num_hashes)
        ]
    )
    return out.withColumn("minhash", sigs).drop("__h")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 5,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = 2000,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH, verified
    by estimated Jaccard (signature agreement rate).

    Returns (id_a, id_b, est_jaccard) with id_a < id_b.

    max_bucket_size guards the candidate self-join against pathological
    corpora (a band bucket holding m ids yields m^2 pairs): buckets
    larger than the cap are dropped from candidate generation, trading
    recall on extreme-duplication clusters for a hard bound on join
    blow-up — the standard LSH production guard. None disables.
    """
    rows_per_band = num_hashes // bands
    src = df.select(id_col, text_col)
    # shingling+hashing is CPU-heavy per doc: if the source has fewer
    # partitions than cores (small-file corpora), fan out first
    par = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    sig = minhash_signatures(src, text_col, num_hashes, k)
    # signatures are computed once and reused on both sides of two
    # joins — persist to avoid re-shingling the corpus three times
    sig = sig.select(id_col, "minhash").persist()
    try:
        # band key = hash of the band's signature slice; candidate
        # generation shuffles ONLY (band, bucket, id) — 24 bytes/row —
        # never the signature arrays
        banded = sig.select(
            F.col(id_col),
            F.posexplode(
                F.array(
                    *[
                        F.xxhash64(
                            F.slice("minhash", i * rows_per_band + 1, rows_per_band),
                            F.lit(i),
                        )
                        for i in range(bands)
                    ]
                )
            ).alias("band", "bucket"),
        )
        if max_bucket_size is not None:
            from pyspark.sql.window import Window as _W

            bucket_n = F.count("*").over(_W.partitionBy("band", "bucket"))
            banded = (
                banded.withColumn("__bn", bucket_n)
                .filter(F.col("__bn") <= max_bucket_size)
                .drop("__bn")
            )
        a = banded.select("band", "bucket", F.col(id_col).alias("id_a"))
        b = banded.select("band", "bucket", F.col(id_col).alias("id_b"))
        pairs = (
            a.join(b, on=["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        # attach signatures to the (much smaller) deduped pair set
        pairs = pairs.join(
            sig.select(F.col(id_col).alias("id_a"), F.col("minhash").alias("__sig_a")),
            on="id_a",
        ).join(
            sig.select(F.col(id_col).alias("id_b"), F.col("minhash").alias("__sig_b")),
            on="id_b",
        )
        # estimated jaccard = fraction of agreeing signature positions
        est = F.size(
            F.filter(F.zip_with("__sig_a", "__sig_b", lambda x, y: x == y), lambda v: v)
        ) / F.size("__sig_a")
        out = (
            pairs.withColumn("est_jaccard", F.round(est, 4))
            .filter(F.col("est_jaccard") >= jaccard_threshold)
            .select("id_a", "id_b", "est_jaccard")
        )
        out = out.localCheckpoint()  # materialize before unpersisting sig
    finally:
        sig.unpersist()
    return out


def simhash64(col: Column | str, k: int = 5) -> Column:
    """64-bit SimHash over character shingles, expression-only.

    For each bit b: sum over shingles of sign(bit b of xxhash64) and
    take the majority. aggregate() folds the +/-1 votes per bit."""
    sh = shingles(col, k=k)

    def voter(mask):
        # factory closure: F.aggregate inspects lambda arity, so the
        # mask must be captured, not passed as a default argument
        return lambda acc, s: acc + F.when(
            F.xxhash64(s).bitwiseAND(mask) != 0, 1
        ).otherwise(-1)

    bits = []
    for b in range(64):
        mval = (1 << b) if b < 63 else -(1 << 63)  # signed-long-safe bit 63
        mask = F.lit(mval).cast("long")
        vote = F.aggregate(sh, F.lit(0).cast("long"), voter(mask))
        bits.append(F.when(vote > 0, mask).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for bcol in bits[1:]:
        out = out.bitwiseOR(bcol)
    return out


def simhash_dedup_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit signature into 4
    16-bit chunks (pigeonhole: hamming<=3 implies >=1 identical chunk),
    self-join on (chunk_idx, chunk), verify exact Hamming distance."""
    sig = df.select(id_col, simhash64(text_col).alias("__sim"))
    chunks = sig.select(
        id_col,
        "__sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("__sim", 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.select("chunk_idx", "chunk", F.col(id_col).alias("id_a"), F.col("__sim").alias("__sa"))
    b = chunks.select("chunk_idx", "chunk", F.col(id_col).alias("id_b"), F.col("__sim").alias("__sb"))
    ham = F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
    return (
        a.join(b, on=["chunk_idx", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs sharing at
    least one n-gram. Inverted-index join (explode ngrams, self-join on
    ngram) -> exact Jaccard via array intersect/union sizes.
    Quadratic in the worst case — the exact verifier for small/medium
    corpora or post-LSH candidates; use minhash_lsh_pairs at scale."""
    grams = df.select(F.col(id_col), word_ngrams(text_col, n).alias("__g"))
    inv = grams.select(id_col, "__g", F.explode("__g").alias("gram"))
    a = inv.select(F.col("gram"), F.col(id_col).alias("id_a"), F.col("__g").alias("__ga"))
    b = inv.select(F.col("gram"), F.col(id_col).alias("id_b"), F.col("__g").alias("__gb"))
    jac = F.size(F.array_intersect("__ga", "__gb")) / F.size(F.array_union("__ga", "__gb"))
    return (
        a.join(b, on="gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits: int = 12,
    seed: int = 7,
) -> DataFrame:
    """Embedding cosine near-dup via random-hyperplane LSH buckets +
    exact cosine verify within buckets (see similarity.py for the
    shared hyperplane machinery)."""
    from .similarity import add_hyperplane_bucket, cosine

    with_b = add_hyperplane_bucket(df, vec_col, bits=bits, seed=seed)
    a = with_b.select(F.col("__bucket"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = with_b.select(F.col("__bucket"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    cos = cosine(F.col("__va"), F.col("__vb"))
    return (
        a.join(b, on="__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cos, 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
