"""Deduplication operators (training-data-pipeline extensions).

- exact: hash-groupBy on content (one shuffle on the md5 key; at
  100 TB this is the canonical dedup shuffle — partial aggregation
  does not apply, but the key is uniform so no skew).
- n-gram Jaccard: exact shingle-join similarity (the oracle-grade
  near-dup path; quadratic in candidates, so production use composes
  it *after* MinHash-LSH candidate generation).
- MinHash + LSH: banded signature blocking → candidate pairs →
  exact-Jaccard verification. Signatures are min-wise hashes
  h_j(s) = (a_j·s + b_j) mod (2^31−1) over md5-derived 32-bit shingle
  hashes — pure integer math, reproducible in SQL.
- SimHash: 32-bit sign-vote fingerprint + banded hamming blocking.

Everything stays JVM-side (explode / groupBy / join); no Python in
the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ffcl_spark.functions import text as X

# Fixed MinHash permutation constants: generated once by the LCG
# x_{n+1} = (1103515245 x + 12345) mod 2^31 from seed 7 (documented so
# any engine can regenerate them).
def _lcg_constants(n: int, seed: int = 7) -> list[tuple[int, int]]:
    x = seed
    out = []
    for _ in range(n):
        x = (1103515245 * x + 12345) % 2147483648
        a = x | 1  # odd multiplier
        x = (1103515245 * x + 12345) % 2147483648
        b = x
        out.append((a, b))
    return out


N_HASHES = 32
N_BANDS = 8  # 8 bands × 4 rows
MINHASH_AB = _lcg_constants(N_HASHES)
SIMHASH_BITS = 32


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, canonical_id, group_size): exact-content dup groups keyed
    by md5(text); canonical = min id in group."""
    h = df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("h"))
    groups = h.groupBy("h").agg(
        F.min("id").alias("canonical_id"), F.count(F.lit(1)).alias("group_size")
    )
    return h.join(groups, "h").select("id", "canonical_id", "group_size")


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    toks = X.tokens(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"), F.explode(X.shingles(toks, n)).alias("shingle")
    ).where(F.col("shingle") != "")


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with Jaccard(shingle sets) ≥
    threshold, id_a < id_b. With ``candidates`` (id_a, id_b) given,
    only those pairs are scored (LSH composition); otherwise all pairs
    sharing ≥1 shingle are scored exactly."""
    sh = _doc_shingles(df, id_col, text_col, n).persist()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    if candidates is not None:
        # restrict BOTH shingle sides to candidate docs before the
        # co-shingle join — the candidate filter must hit the join
        # input, not its (quadratic) output
        a = a.join(
            candidates.select(F.col("id_a")).distinct(), "id_a", "left_semi"
        )
        b = b.join(
            candidates.select(F.col("id_b")).distinct(), "id_b", "left_semi"
        )
    pair_counts = a.join(b, "shingle").where(F.col("id_a") < F.col("id_b"))
    if candidates is not None:
        # pre-aggregation semi-join (AQE picks broadcast when small)
        pair_counts = pair_counts.join(candidates, ["id_a", "id_b"], "left_semi")
    inter = pair_counts.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter"))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, sig_0..sig_{N_HASHES-1}): min-wise signatures over
    md5-derived shingle hashes. One explode + one groupBy with
    N_HASHES partial-aggregating mins — all JVM."""
    sh = _doc_shingles(df, id_col, text_col, n)
    s32 = X.tok_hash32(F.col("shingle"))
    aggs = [
        F.min((s32 * F.lit(a) + F.lit(b)) % F.lit(X.HASH_PRIME)).alias(f"sig_{j}")
        for j, (a, b) in enumerate(MINHASH_AB)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_candidates(sigs: DataFrame) -> DataFrame:
    """Banded LSH: docs sharing any full band of signature values
    become a candidate pair (id_a < id_b, distinct)."""
    rows_per_band = N_HASHES // N_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat_ws(
                    ":", *[F.col(f"sig_{bi * rows_per_band + j}") for j in range(rows_per_band)]
                ).alias("key"),
            )
            for bi in range(N_BANDS)
        ]
    )
    bk = sigs.select("id", F.explode(bands).alias("b")).select(
        "id", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    a = bk.select(F.col("id").alias("id_a"), "band", "key")
    b = bk.select(F.col("id").alias("id_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline: signatures → banded candidates →
    exact Jaccard verification ≥ threshold."""
    sigs = minhash_signatures(df, id_col, text_col, n)
    cands = minhash_lsh_candidates(sigs)
    return ngram_jaccard_pairs(
        df, threshold, id_col, text_col, n, candidates=cands
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash): 32-bit sign-vote fingerprint over token hashes.
    bit_i = 1 iff Σ_tokens (bit_i(h) ? +1 : −1) > 0. Integer-exact."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(X.tokens(F.col(text_col))).alias("tok")
    )
    h = X.tok_hash32(F.col("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("id").agg(*votes)
    fp = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v_{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp + bit
    return agg.select("id", fp.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_a, id_b, hamming): pairs within hamming distance via banded
    blocking (4 bands × 8 bits — any exact band match is a candidate;
    guaranteed complete for hamming ≤ 3 by pigeonhole)."""
    fps = simhash(df, id_col, text_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftright(F.col("simhash"), bi * 8).bitwiseAND(F.lit(255)).alias("key"),
            )
            for bi in range(4)
        ]
    )
    bk = fps.select("id", "simhash", F.explode(bands).alias("b")).select(
        "id", "simhash", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    a = bk.select(F.col("id").alias("id_a"), F.col("simhash").alias("fp_a"), "band", "key")
    b = bk.select(F.col("id").alias("id_b"), F.col("simhash").alias("fp_b"), "band", "key")
    pairs = (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        pairs.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
