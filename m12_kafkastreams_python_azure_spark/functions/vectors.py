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
    """Dot product for a KNOWN dimension, unrolled into a flat element_at
    sum. Higher-order functions (``aggregate``/``zip_with``) are
    CodegenFallback — evaluated by interpreting the expression tree per
    ROW — which is fine on O(n) paths but dominates pair-quadratic plans
    (an all-pairs cosine join runs ~10x faster unrolled, and without the
    JIT-lottery variance the interpreted path shows). Addition order is
    the same left fold as ``dot_product``, so results are bit-identical.

    Rows whose arrays are shorter than ``dim`` yield NULL (``F.get``
    returns NULL out of bounds — unlike ``element_at``, which THROWS
    under Spark 4's default ANSI mode) instead of a partial sum —
    acceptable for fixed-dim embedding columns, which is the only place
    this belongs."""
    acc: Column = F.lit(0.0)
    ca, cb = _col(a), _col(b)
    for i in range(dim):
        acc = acc + (
            F.get(ca, i).cast("double") * F.get(cb, i).cast("double")
        )
    return acc


