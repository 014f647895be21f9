"""Text-analysis column helpers (tokenization, shingling).

All pure column algebra — ``split`` / ``transform`` / ``sequence`` stay
inside whole-stage codegen; shingling a 100 TB documents table is a
map-only stage with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def whitespace_tokens(text: Column | str) -> Column:
    """Whitespace tokens with empties removed."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def shingles(text: Column | str, n: int = 3, sep: str = "|") -> Column:
    """Array of n-word shingles (contiguous token n-grams), duplicates kept.

    Built as: tokens → for i in 1..len-n+1: join(tokens[i..i+n-1]).
    """
    toks = whitespace_tokens(text)
    k = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(1), F.greatest(k, F.lit(0)))
    return F.when(k >= 1, F.transform(
        idx,
        lambda i: F.concat_ws(
            sep, *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )).otherwise(F.array().cast("array<string>"))
