"""Skew-salted join — the manual fix when one join key dominates.

A shuffled hash/sort-merge join sends every row of a key to ONE reducer;
a hot key (a viral video's comments, a bot user's events) turns into a
straggler task that runs for hours while 999 executors idle. AQE's
skew-join split handles sort-merge cases automatically (and stays on in
our session), but it can't split a hash-partitioned stream feeding a
stateful op, and it never helps a broadcast-ineligible dim with one fat
key. The manual rewrite:

    fact:  salt = anything uniform per row, mod S  → key becomes (key, salt)
    dim :  explode each row to all S salts         → S× replication
    join on (key, salt)                            → hot key spreads S ways

Replication cost is |dim| × S extra rows — use it when the dim is small
enough to replicate but too big (or too hot) to broadcast. The result is
row-identical to the plain join (each fact row still meets each matching
dim row exactly once), which is what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 8,
    fact_salt: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact` ⋈ `dim` on `on`, salted S ways.

    `fact_salt`: per-row salt expression; defaults to a hash of the whole
    fact row (deterministic — safe under task retries, unlike rand())."""
    if fact_salt is None:
        fact_salt = F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets))
    f = fact.withColumn("_salt", fact_salt.cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return f.join(d, on=[on, "_salt"], how=how).drop("_salt")
