"""MinHash / LSH-band / SimHash primitives (SURVEY.md J1, dedup family).

The reference bounds its candidate space with a FAISS inner-product index
(bela/task/joint_el_task.py:513-523, 596-603). The Spark-native bound is
locality-sensitive hashing expressed as *columns*: md5-based minhashes over
token shingles, grouped into band keys that become equi-join keys. md5 is used
(not xxhash64) so the DuckDB oracle reproduces every value bit-for-bit; at
cluster scale the md5 cost is negligible next to the shuffle it saves.

All operators here are DataFrame -> DataFrame with only built-in functions —
the explode/groupBy shapes give Catalyst partial aggregation (map-side combine
of the per-seed min) for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def minhash_wide(
    df: DataFrame,
    id_col: str = "rid",
    shingles_col: str = "shingles",
    num_hashes: int = 16,
) -> DataFrame:
    """(id, mh0..mh{n-1}): per-seed minimum of md5(shingle '#' seed).

    Equivalent to num_hashes independent permutations. One explode of distinct
    shingles, then num_hashes min() aggregates in a single groupBy — min is a
    partial aggregate, so the shuffle carries exactly one num_hashes-column
    row per record regardless of document length (no seed explode).
    """
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.col(shingles_col))).alias("shingle"),
    )
    aggs = [
        F.min(F.md5(F.concat_ws("#", F.col("shingle"), F.lit(str(s))))).alias(f"mh{s}")
        for s in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "rid",
    shingles_col: str = "shingles",
    num_hashes: int = 16,
) -> DataFrame:
    """(id, seed, mh): exploded view of minhash_wide (for queries/oracles)."""
    wide = minhash_wide(df, id_col, shingles_col, num_hashes)
    structs = F.array(
        *[
            F.struct(F.lit(s).alias("seed"), F.col(f"mh{s}").alias("mh"))
            for s in range(num_hashes)
        ]
    )
    return wide.select(id_col, F.explode(structs).alias("x")).select(
        id_col, F.col("x.seed").alias("seed"), F.col("x.mh").alias("mh")
    )


def band_keys(
    wide: DataFrame,
    id_col: str = "rid",
    num_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """(id, band, band_key): md5 over each band's ordered minhashes, computed
    straight from the wide signature columns (narrow, no shuffle).

    Records sharing any band key become candidate pairs — the LSH OR-of-ANDs
    construction. band_key strings are uniform-random, so the downstream
    equi-join keys are naturally well-distributed except for true mega-groups
    (handled by salting in operators/pairs.py).
    """
    assert num_hashes % band_size == 0, "num_hashes must be divisible by band_size"
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"mh{b * band_size + i}") for i in range(band_size)]
                    )
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return wide.select(id_col, F.explode(bands).alias("x")).select(
        id_col, F.col("x.band").alias("band"), F.col("x.band_key").alias("band_key")
    )


def simhash32(tokens_col: Column | str) -> Column:
    """32-bit SimHash of a token array, as a BIGINT (0..2^32-1).

    Bit b of the fingerprint is the majority vote over tokens of the high bit
    of nibble b of md5(token) (i.e. hex char b is in [89abcdef]). Each bit is
    an independent hash bit, so this is a standard SimHash; the nibble-char
    formulation keeps the arithmetic pure string ops — JVM-side higher-order
    functions here, and the identical expression in the SQL oracle.
    """
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    hashes = F.transform(t, F.md5)
    # vote for bit b: +1 if hex char b of md5(token) >= '8', else -1
    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(31)),
        lambda b: F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.substr(b + 1, F.lit(1)).isin(list("89abcdef")), 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(31)),
            # F.shiftleft needs a Python-int bit count; pow(2, b) is exact for
            # b <= 31 in doubles and accepts a Column exponent
            lambda v, b: F.when(v > 0, F.pow(F.lit(2.0), b).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def hamming32(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two 32-bit fingerprints (bit_count of xor)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))
