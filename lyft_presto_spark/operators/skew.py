"""Skew-mitigation join: explicit key salting.

AQE's skew-join handling (spark.sql.adaptive.skewJoin, on in session.py)
covers sort-merge joins automatically; explicit salting is the tool for the
cases AQE can't split — a hot build key in a shuffled hash join, or an
aggregation with one dominant group. The reference's analog problem space is
its partitioned exchanges with hash distribution (PartitionedOutputOperator
.java:48); Presto 319 has no skew mitigation at all, so this is
strictly-better territory.

Mechanism: replicate the small side SALT_N times (one copy per salt value),
salt the big side's key with a uniform random-ish residue derived from a row
value (deterministic — no rand(), so plans stay reproducible), then join on
(key, salt). The hot key's rows spread over SALT_N reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_n: int = 8,
    salt_source: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join big⨝small on equality with the big side's key salted ``salt_n`` ways.

    ``salt_source``: column/expression whose hash spreads the big side's rows
    (defaults to a per-row monotonically increasing id; pass a stable column
    for fully deterministic task retry behavior at scale).
    """
    if salt_source is None:
        src = F.monotonically_increasing_id()
    elif isinstance(salt_source, str):
        src = F.col(salt_source)
    else:
        src = salt_source
    salted_big = big.withColumn("__salt", F.pmod(F.xxhash64(src), F.lit(salt_n)))
    exploded_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    joined = salted_big.join(
        exploded_small,
        (salted_big[big_key] == exploded_small[small_key])
        & (salted_big["__salt"] == exploded_small["__salt"]),
        how,
    )
    return joined.drop("__salt")
