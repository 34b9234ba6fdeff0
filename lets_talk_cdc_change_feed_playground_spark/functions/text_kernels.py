"""Arrow-batched fast kernels for the text-hash primitives.

The :mod:`.textops` primitives are pure Catalyst higher-order functions —
ideal for oracle parity, but Spark evaluates array lambdas *interpreted*
(no whole-stage codegen), and profiling showed ~40 µs per element: the
bigram/minhash stages spent 11-14 s on 5000 docs while the joins took <1 s.

These pandas UDFs compute the **identical integer arithmetic** (Python ints
== Catalyst longs exactly — both arbitrary-precision folds mod small primes)
in tight Python loops over Arrow batches, ~20-40× faster.  Every kernel has
a Catalyst twin in :mod:`.textops`; ``tests/test_pipeline.py`` cross-checks
them value-for-value so the oracle contract is preserved.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from lets_talk_cdc_change_feed_playground_spark.functions.textops import (
    N_PERM,
    TOKEN_HASH_PRIME,
    perm_constants,
)

_PERMS = perm_constants(N_PERM)


def _hash_token(t: str, mod: int = TOKEN_HASH_PRIME) -> int:
    acc = 0
    for ch in t:
        acc = (acc * 31 + ord(ch)) % mod
    return acc


def _token_hashes(norm: str) -> list[int]:
    return [_hash_token(t) for t in norm.split(" ")]


@F.pandas_udf(ArrayType(LongType()))
def token_hashes_kernel(norm: pd.Series) -> pd.Series:
    return norm.map(_token_hashes)


@F.pandas_udf(ArrayType(LongType()))
def minhash_signature_kernel(norm: pd.Series) -> pd.Series:
    """16-permutation MinHash signature of the token multiset."""

    def sig(s: str) -> list[int]:
        th = _token_hashes(s)
        return [min((h * a + b) % TOKEN_HASH_PRIME for h in th) for a, b in _PERMS]

    return norm.map(sig)


@F.pandas_udf(ArrayType(LongType()))
def distinct_token_hashes_kernel(norm: pd.Series) -> pd.Series:
    """Distinct token hashes (first-occurrence order; consumers only use
    set size / intersection size, never element order)."""

    def dset(s: str) -> list[int]:
        return list(dict.fromkeys(_token_hashes(s)))

    return norm.map(dset)


@F.pandas_udf(ArrayType(LongType()))
def bigram_hashes_kernel(norm: pd.Series) -> pd.Series:
    """Distinct word-bigram shingle hashes: ``h1 * P + h2``."""

    def big(s: str) -> list[int]:
        th = _token_hashes(s)
        return list(
            dict.fromkeys(
                th[i] * TOKEN_HASH_PRIME + th[i + 1] for i in range(len(th) - 1)
            )
        )

    return norm.map(big)


@F.pandas_udf(LongType())
def simhash_kernel(norm: pd.Series) -> pd.Series:
    """32-bit SimHash of the token multiset (sign-sum per bit)."""

    def sh(s: str) -> int:
        th = _token_hashes(s)
        out = 0
        for b in range(32):
            acc = 0
            for h in th:
                acc += ((h >> b) & 1) * 2 - 1
            if acc > 0:
                out |= 1 << b
        return out

    return norm.map(sh)


CHUNK_TOKENS = 16  # non-overlapping token window for boilerplate chunk dedup
CONTAM_NGRAM = 8  # overlapping word n-gram for contamination screening


def _ngram_fold(th: list[int], i: int, n: int, mod: int = TOKEN_HASH_PRIME) -> int:
    acc = 0
    for h in th[i : i + n]:
        acc = (acc * 31 + h) % mod
    return acc


@F.pandas_udf(ArrayType(LongType()))
def chunk_hashes_kernel(norm: pd.Series) -> pd.Series:
    """Fingerprints of non-overlapping 16-token chunks (boilerplate dedup);
    Catalyst twin: the `_ngram_fold` slices in ``pipeline_queries``."""

    def f(s: str) -> list[int]:
        th = _token_hashes(s)
        n = CHUNK_TOKENS
        return [_ngram_fold(th, i * n, n) for i in range(len(th) // n)]

    return norm.map(f)


@F.pandas_udf(ArrayType(LongType()))
def contam_ngram_hashes_kernel(norm: pd.Series) -> pd.Series:
    """Distinct overlapping 8-gram fingerprints (contamination screening)."""

    def f(s: str) -> list[int]:
        th = _token_hashes(s)
        n = CONTAM_NGRAM
        return list(
            dict.fromkeys(_ngram_fold(th, i, n) for i in range(len(th) - n + 1))
        )

    return norm.map(f)
