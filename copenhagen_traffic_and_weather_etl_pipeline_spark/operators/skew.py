"""Skew-safe join: salting for hot keys (SURVEY §6 scale posture).

AQE's skew-join handling splits oversized sort-merge partitions at
runtime, but it can't help a broadcast-ineligible join where ONE key
holds a double-digit percentage of the rows — that partition is one
task no matter how it's split by size, because every row must meet
every matching row. Salting fixes the layout: the big side spreads each
key's rows across ``n_salts`` sub-keys (hashing the whole row, so a hot
key's rows fan out), and the small side is replicated once per salt.
The join key becomes (key, salt); the result is exactly the plain
equi-join's.

Cost model: small side is duplicated n_salts times (choose n_salts ~
max-key-rows / target-task-rows, typically 8-64); the hot key's work
now runs on n_salts tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted.

    Deterministic: the salt is xxhash64 over ALL big-side columns (not a
    random number), so reruns and retried tasks place every row
    identically. Rows that are full duplicates share a salt — harmless,
    duplicates are interchangeable.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast(
        "int"
    )
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    return big_s.join(small_s, on=[*on, "_salt"], how=how).drop("_salt")


__all__ = ["salted_join"]
