"""Vector math as pure column algebra (higher-order functions).

No UDFs: ``zip_with`` + ``aggregate`` run JVM-side, so a cosine
similarity over a 64-dim float array costs one codegen'd loop per row —
the cheapest possible per-row vector op in Spark. Accumulation is in
double regardless of the array element type.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two numeric arrays (double accumulation)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine of two float vectors, JVM-side.

    A zero-norm vector has no direction: the division is 0.0/0.0 — a
    DIVIDE_BY_ZERO crash under ANSI mode (Spark 4's default) and NULL
    otherwise — while DuckDB's ``list_cosine_similarity``, which every
    oracle uses, returns **-1.0** for the same input. try_divide +
    COALESCE to -1.0 ("never similar") so Spark neither crashes nor
    diverges from its oracle if a degenerate all-zero embedding ever
    ships in testdata; -1.0 fails every similarity threshold and sorts
    last in every descending ranking, exactly like the NULL it
    replaces. The -1.0 fill applies ONLY when the denominator is a real
    0.0 — i.e. a genuine zero-norm vector. Every other NULL propagates:
    a NULL input vector stays NULL (DuckDB returns NULL for it too),
    and a vector CONTAINING a NULL element yields NULL rather than a
    fabricated -1.0 (DuckDB hard-errors on that input, so the oracle
    replay fails loudly instead of comparing against an invented
    score)."""
    a_col = F.col(a) if isinstance(a, str) else a
    b_col = F.col(b) if isinstance(b, str) else b
    den = l2_norm(a_col) * l2_norm(b_col)
    # den == 0.0 is NULL-safe here: a NULL vector or NULL element makes
    # den NULL, the WHEN falls through, and try_divide(x, NULL) = NULL.
    # In the otherwise branch den is non-zero, so no ANSI /0 either way.
    return F.when(den == 0.0, F.lit(-1.0)).otherwise(
        F.try_divide(dot(a_col, b_col), den)
    )
