"""Hash/sketch column expressions: shingles, MinHash, SimHash, band-LSH.

Replaces the reference's O(n^2) SequenceMatcher pair loop
(nlp_analyzer.py:720-743) with sketch + bucket-join near-dup detection
that scales to 10^12 documents. Two families:

 - xxhash64-based (fast JVM path, default at scale)
 - md5-string-based ("portable" variant whose values any engine can
   reproduce — used by the oracle-checked correctness queries)

All pure Catalyst expressions; no Python in the hot path.

Performance note: composing minhash_signature/band_keys over an
*expression* (rather than a materialized column) triggers Catalyst's
CollapseProject to re-inline the shingle subtree into every lambda
site — O(hashes x tokens^2) per doc. For corpus-scale dedup use
operators/dedup.near_duplicates_minhash, which computes signatures via
explode + map-side-combined min aggregation instead (linear, one tiny
shuffle)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_quality_checker_spark.functions.text import tokens, word_ngrams

__all__ = [
    "shingles",
    "minhash_signature",
    "minhash_signature_md5",
    "oph_signature_md5",
    "band_keys",
    "simhash64",
    "jaccard",
]


def shingles(text: Column | str, k: int = 3) -> Column:
    """Word k-shingles (distinct) of a document."""
    return F.array_distinct(word_ngrams(tokens(text), k))


def minhash_signature(sh: Column, num_hashes: int = 16) -> Column:
    """array<bigint> MinHash signature via seeded xxhash64 over shingles.

    xxhash64(shingle, seed_j) is a distinct hash family member per j;
    min over the shingle set approximates Jaccard similarity. Empty
    shingle sets yield NULL entries (callers filter).
    """
    def _hasher(j: int):
        # single-arg closure: a 2-arg lambda would be (element, index)
        return lambda s: F.xxhash64(s, F.lit(j))

    sigs = [
        F.array_min(F.transform(sh, _hasher(j))) for j in range(num_hashes)
    ]
    return F.array(*sigs)


def minhash_signature_md5(sh: Column, num_hashes: int = 8) -> Column:
    """array<string> MinHash using lexicographic-min md5 hex digests of
    seed-prefixed shingles. Slower than xxhash64 but byte-reproducible
    in DuckDB/Trino/anything with md5 — used for cross-engine checks."""
    def _hasher(j: int):
        return lambda s: F.md5(F.concat(F.lit(f"{j}|"), s))

    sigs = [
        F.array_min(F.transform(sh, _hasher(j))) for j in range(num_hashes)
    ]
    return F.array(*sigs)


def oph_signature_md5(sh: Column) -> Column:
    """array<string> (16 entries) one-permutation MinHash in the md5
    family — the cross-engine twin of the xxhash64 OPH path in
    operators/dedup.near_duplicates_minhash(one_permutation=True):
    ONE md5 per shingle, binned by the digest's first hex nibble
    (16 bins — a natural radix both engines slice identically);
    component j = lexicographic min within bin j; empty bins densified
    deterministically from the set's global min digest
    (md5(gmin || '|' || hex(j))), so two sets sharing their global
    minimum (probability = their Jaccard) agree on every empty bin.

    Same CollapseProject caveat as minhash_signature_md5: 17 lambda
    sites re-inline the shingle subtree — fine for bounded oracle
    slices, use the operator's explode+agg form at corpus scale."""
    hashed = F.transform(sh, lambda s: F.md5(s))
    gmin = F.array_min(hashed)

    def _bin_pred(d: str):
        # factory, NOT a defaulted second parameter: PySpark passes
        # (element, index) to any two-parameter lambda, defaults
        # included, which would silently bind d to the index column
        return lambda h: F.substring(h, 1, 1) == d

    comps = []
    for j in range(16):
        d = f"{j:x}"
        comps.append(
            F.coalesce(
                F.array_min(F.filter(hashed, _bin_pred(d))),
                F.md5(F.concat(gmin, F.lit(f"|{d}"))),
            )
        )
    return F.array(*comps)


def band_keys(sig: Column, num_bands: int, rows_per_band: int) -> Column:
    """array<string> of LSH band keys: band index + md5 of the band's
    signature slice. Docs sharing any band key are near-dup candidates;
    explode + groupBy(band_key) turns candidate generation into an
    equi-shuffle instead of an all-pairs join."""
    keys = [
        F.concat(
            F.lit(f"b{b}:"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(sig, b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                )
            ),
        )
        for b in range(num_bands)
    ]
    return F.array(*keys)


def simhash64(text: Column | str) -> Column:
    """64-bit SimHash over tokens, entirely in Catalyst lambda algebra:
    per-token xxhash64 -> ±1 votes per bit -> sign -> packed bigint."""
    tok = tokens(text)
    zero64 = F.array_repeat(F.lit(0).cast("long"), 64)
    bitpos = F.sequence(F.lit(0), F.lit(63))
    votes = F.aggregate(
        tok,
        zero64,
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                bitpos,
                lambda i: F.when(
                    F.getbit(F.xxhash64(t), i) == 1, F.lit(1).cast("long")
                ).otherwise(F.lit(-1).cast("long")),
            ),
            lambda a, b: a + b,
        ),
    )
    # two's-complement packing: sum of 2^i for positive-vote bits; bit 63
    # contributes -2^63 so the running sum never overflows a signed long.
    pow2 = [1 << i for i in range(63)] + [-(1 << 63)]
    from data_quality_checker_spark.functions.litfast import (
        lit_long_array,
    )

    pow2_arr = lit_long_array(pow2)  # one parse, not 64 py4j lits
    packed = F.aggregate(
        F.zip_with(
            votes,
            pow2_arr,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.when(F.size(tok) > 0, packed)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two string arrays (verification step
    after LSH candidate generation)."""
    da, db = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(da, db))
    union = F.size(da) + F.size(db) - inter
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
