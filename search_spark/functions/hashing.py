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
