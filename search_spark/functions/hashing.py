"""Cross-engine deterministic hashing — spec v1.

Every dedup/fingerprint operator needs a hash that the Spark engine, the
DuckDB oracle SQL, and the plain-Python oracle compute bit-identically.
Spec v1 pins it to the first 8 hex chars of md5 (32-bit, UTF-8 input):

    h32(s) = int(md5(s)[:8], 16)                 in [0, 2^32)

All three implementations are pure built-ins (Spark: ``md5``/``conv`` —
JVM-side, whole-stage codegen; no Python UDF anywhere on the hot path).

Derived families (all integer arithmetic, overflow-checked for signed
64-bit so Spark LongType and DuckDB BIGINT agree exactly):

- MinHash permutations:  mh_j(s) = (A_j * (h32(s) % P) + B_j) % P with
  P = 2^31 - 1 and A_j, B_j themselves derived from h32 — constants are
  generated once here and inlined into both engines' expressions.
  Bounds: A_j < P < 2^31, h32 % P < 2^31 → product < 2^62 < 2^63-1.  OK.
- Rolling document fingerprint:  left fold over tokens,
  acc' = (acc * 131 + h32(tok)) % P — fold order is pinned (token order),
  integer math → engines agree bit-for-bit.

The reference analogue: the GGUF model file pins text→vector meaning
(/root/reference/llama.go:20-36); here the hash spec pins text→signature
meaning, and HASH_SPEC_VERSION is the codec-style version gate
(/root/reference/index_codec.go:56-58).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_SPEC_VERSION = 1

#: modulus for all derived hash families (Mersenne prime 2^31 - 1)
P31 = 2_147_483_647
#: rolling-fingerprint multiplier
ROLL_B = 131

# -- MinHash family ---------------------------------------------------------
MINHASH_K = 16       # signature length
MINHASH_BANDS = 4    # LSH bands (rows per band = K // BANDS = 4)
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS


def h32_py(s: str) -> int:
    """Python reference implementation of spec-v1 h32."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def h32_col(c: Column) -> Column:
    """Spark Column: h32 of a string column (md5 + conv, JVM built-ins)."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """DuckDB SQL fragment: h32 of a string expression."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def _derived_constant(tag: str, j: int) -> int:
    v = h32_py(f"search_spark/{tag}/{j}") % P31
    return v if v > 0 else 1


#: inlined permutation constants — identical literals reach both engines
MINHASH_A = tuple(_derived_constant("minhash_a", j) for j in range(MINHASH_K))
MINHASH_B = tuple(_derived_constant("minhash_b", j) for j in range(MINHASH_K))


def minhash_perm_col(h: Column, j: int) -> Column:
    """Spark: permuted hash j of an h32 column."""
    return (F.lit(MINHASH_A[j]) * (h % F.lit(P31)) + F.lit(MINHASH_B[j])) % F.lit(P31)


def minhash_perm_sql(h_expr: str, j: int) -> str:
    """DuckDB: permuted hash j of an h32 expression."""
    return f"(({MINHASH_A[j]} * (({h_expr}) % {P31}) + {MINHASH_B[j]}) % {P31})"


def minhash_perm_py(h: int, j: int) -> int:
    return (MINHASH_A[j] * (h % P31) + MINHASH_B[j]) % P31


# -- Rolling fingerprint ----------------------------------------------------

def rolling_fp_col(tokens: Column) -> Column:
    """Spark: left-fold rolling hash over a token array (F.aggregate —
    sequential, order-pinned, pure JVM)."""
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(ROLL_B) + h32_col(t) % F.lit(P31)) % F.lit(P31),
    )


def rolling_fp_sql(tokens_expr: str) -> str:
    """DuckDB: the same left fold via list_reduce (seeded with 0 by
    prepending; list_reduce folds left-to-right)."""
    h = h32_sql("t")
    return (
        f"COALESCE(list_reduce("
        f"list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({tokens_expr}, t -> {h} % {P31})), "
        f"(acc, x) -> (acc * {ROLL_B} + x) % {P31}), 0)"
    )


def rolling_fp_py(tokens: list[str]) -> int:
    acc = 0
    for t in tokens:
        acc = (acc * ROLL_B + h32_py(t) % P31) % P31
    return acc


# -- Spark-compatible xxHash64 (pure Python twin) -----------------------------
#
# The postings AND dictionary layouts are partitioned by
# term_bucket = pmod(xxhash64(term), B) (a JVM expression at write time,
# operators/indexer.py).  The query side needs the same bucket DRIVER-SIDE
# before any Spark job runs, so dictionary lookups can carry partition
# filters — that requires a bit-exact Python twin of Spark's XxHash64
# (standard XXH64 over the UTF-8 bytes, seed 42).  Three-way agreement with
# F.xxhash64 is pinned in tests over the corpus vocabulary plus adversarial
# lengths/codepoints; IndexReader additionally asserts python-vs-stored
# bucket equality on every dictionary row it fetches.

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xx_round(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * _XXP2) & _M64, 31) * _XXP1) & _M64


def xxhash64_py(data: bytes | str, seed: int = 42) -> int:
    """Spark-semantics xxhash64: SIGNED 64-bit XXH64 of the bytes (strings
    hash their UTF-8 encoding), default seed 42 like F.xxhash64."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i <= n - 32:
            v1 = _xx_round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _xx_round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _xx_round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _xx_round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _xx_round(0, v)) * _XXP1 + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        h = (_rotl64(h ^ _xx_round(0, int.from_bytes(data[i:i + 8], "little")), 27) * _XXP1 + _XXP4) & _M64
        i += 8
    if i <= n - 4:
        h = (_rotl64(h ^ ((int.from_bytes(data[i:i + 4], "little") * _XXP1) & _M64), 23) * _XXP2 + _XXP3) & _M64
        i += 4
    while i < n:
        h = (_rotl64(h ^ ((data[i] * _XXP5) & _M64), 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def term_bucket_py(term: str, buckets: int) -> int:
    """Driver-side twin of the layout rule
    ``F.pmod(F.xxhash64(term), buckets)`` (non-negative pmod semantics)."""
    return ((xxhash64_py(term) % buckets) + buckets) % buckets
