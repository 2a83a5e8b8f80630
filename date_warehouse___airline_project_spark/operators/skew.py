"""Skew-mitigated join: explicit key salting.

At 100 TB a shuffle join on a skewed key sends every row of the hot key to
one reducer; AQE's skew-join split handles sort-merge joins, but when the
build side must be replicated anyway (medium-sized dim, semi-hot keys) an
explicit salt bounds the worst partition to ``1/n_salts`` of the hot key.

Mechanics (all JVM-side, codegen-able):
  * big side gains ``__salt = pmod(xxhash64(<unique col>), n_salts)`` —
    deterministic per row, uniform across salts;
  * small side is exploded ``n_salts``× (one copy per salt value);
  * the join key becomes ``(key, __salt)``, so each hot key's rows spread
    over ``n_salts`` reducers instead of one.

The *result* is identical to the unsalted join — only the physical
distribution changes — so the plain join is the oracle.

Reference parity: the reference joins staging facts to dims in pandas
(single-node, no skew concept — e.g. transaction→passenger merges in
backend/etl_scripts/cleaning.py); this operator is the scale path the
reference cannot express.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    n_salts: int = 8,
    salt_src: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``big ⋈ small`` on ``on`` with the big side salted ``n_salts`` ways.

    ``salt_src`` is any per-row expression on ``big`` with enough entropy to
    spread a hot key (default: hash of the whole row). The small side is
    replicated ``n_salts``× via ``explode`` — keep it broadcast-sized per
    salt, or the replication itself becomes the cost.
    """
    if salt_src is None:
        salt_src = F.xxhash64(F.struct(*[F.col(c) for c in big.columns]))
    b = big.withColumn(SALT, F.pmod(salt_src, F.lit(n_salts)).cast("int"))
    s = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)]))
    )
    joined = b.join(s, on=[*on, SALT], how=how)
    return joined.drop(SALT)
