"""Text / vector primitives for the LLM-data-pipeline operators.

Everything here is deterministic integer/double arithmetic expressible
identically in Spark and DuckDB (the oracle gate compares values exactly):

- polynomial rolling hashes (Rabin-Karp style) instead of engine-native
  ``hash()``/``xxhash64`` whose implementations differ across engines;
- MinHash via universal-hash permutations ``(a_i * h + b_i) mod P`` over
  token hashes;
- SimHash via per-bit sign sums of token hashes;
- cosine similarity as an explicit left-fold dot product so float summation
  order is identical on both engines (bit-exact comparisons).

All ops are array-expression work per row (no explode in the hot path) —
at 100 TB they scale embarrassingly parallel with zero shuffles until the
LSH band join / top-k stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_HASH_PRIME = 1_000_003
FINGERPRINT_PRIME = 1_000_000_007
N_PERM = 16
N_BANDS = 4  # 4 bands × 4 rows: LSH threshold ≈ (1/4)^(1/4) ≈ 0.71 jaccard
STOPWORDS = ("a", "the", "of", "and", "to", "in", "is", "it")


def normalize_text(col: Column) -> Column:
    """Canonical form for dedup: lowercase, trimmed, collapsed whitespace."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def tokens(norm_col: Column) -> Column:
    return F.split(norm_col, " ")


def poly_hash(col: Column, mod: int) -> Column:
    """Left-fold ``acc*31 + ascii(char) mod m`` over the characters — the
    Rabin-Karp fingerprint; identical in DuckDB via list_reduce."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % mod,
    )


def token_hashes(tokens_col: Column, mod: int = TOKEN_HASH_PRIME) -> Column:
    """Hash every token: array<long>."""
    return F.transform(
        tokens_col,
        lambda t: F.aggregate(
            F.split(t, ""),
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * 31 + F.ascii(ch)) % mod,
        ),
    )


def perm_constants(n_perm: int = N_PERM) -> list[tuple[int, int]]:
    """Deterministic universal-hash constants (a odd, b from a fixed prime)."""
    return [(2 * i + 3, (7919 * (i + 1)) % TOKEN_HASH_PRIME) for i in range(n_perm)]


def minhash_signature(hashes_col: Column, n_perm: int = N_PERM) -> list[Column]:
    """MinHash signature: for each permutation, min over token hashes of
    ``(a*h + b) mod P``. Returns one column per permutation."""
    def _perm(a: int, b: int):
        return lambda h: (h * a + b) % TOKEN_HASH_PRIME

    return [
        F.array_min(F.transform(hashes_col, _perm(a, b))).alias(f"mh{i}")
        for i, (a, b) in enumerate(perm_constants(n_perm))
    ]


def band_hash(sig_cols: list[Column]) -> Column:
    """Fold a band's signature values into one bucket key (values < 2^20, so
    a 31-fold of 4 stays well inside int64 — exact on both engines)."""
    out = sig_cols[0]
    for c in sig_cols[1:]:
        out = out * 31 + c
    return out


def simhash(hashes_col: Column, n_bits: int = 16) -> Column:
    """SimHash: bit b of the fingerprint is set iff the sign-sum of bit b
    over all token hashes is positive."""
    def _bit_step(b: int):
        return lambda acc, h: acc + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1)

    out = F.lit(0).cast("long")
    for b in range(n_bits):
        bit_sum = F.aggregate(hashes_col, F.lit(0).cast("long"), _bit_step(b))
        out = out + F.when(bit_sum > 0, F.lit(2**b)).otherwise(F.lit(0))
    return out


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product — identical summation order in both engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))
