"""Deterministic corpus sampling / quota operators.

Training-data mixing needs reproducible, cluster-order-independent
sampling — ``df.sample()`` is seed-and-partitioning dependent, so a
re-run on a different cluster layout keeps different rows.  These
operators key every decision on a hash of the ROW (doc_id), never on
partition state, so the same corpus always yields the same sample on
1 executor or 1000.

Scale posture:

- ``stratified_sample`` is a pure map-side filter (zero shuffles): the
  per-stratum keep-decision is ``md5(doc_id) mod 1e6 < rate·1e6``.
- ``per_group_quota`` is the two-phase top-N: rank within
  (group, salt) first — bounding any single window partition to the
  salted slice — then rank the ≤ salts·quota survivors per group.
  A single-phase window over a hot group (one domain with 10⁹ docs)
  would sort that group in one task; the salted phase caps it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# decisions are uniform on [0, 1e6) — hash of the doc id, engine-portable
# (same md5→bigint construction as the dedup family; DuckDB mirror:
#  CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT) % 1000000)
SAMPLE_MOD = 1_000_000


def _hash_unit(id_col) -> F.Column:
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(SAMPLE_MOD))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    default_rate: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically.

    ``rates`` maps stratum value → keep-rate in [0, 1]; strata not
    listed use ``default_rate``.  The keep decision depends only on
    ``id_col``, so the sample is identical across cluster layouts and
    re-runs — a map-side filter with no shuffle and no RNG state.
    """
    rate = F.lit(int(round(default_rate * SAMPLE_MOD)))
    for value, r in sorted(rates.items()):
        rate = F.when(
            F.col(stratum_col) == F.lit(value), F.lit(int(round(r * SAMPLE_MOD)))
        ).otherwise(rate)
    return docs.filter(_hash_unit(F.col(id_col)) < rate)


def per_group_quota(
    docs: DataFrame,
    quota: int,
    group_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    salts: int = 16,
) -> DataFrame:
    """At most ``quota`` docs per group, preferring highest
    ``order_col`` (ties → lowest ``id_col``): per-domain caps for a
    crawl corpus.

    Two-phase top-N: phase 1 ranks within (group, hash-salt) and keeps
    ``quota`` per salted slice — the per-salt top-N is a superset of
    the group top-N, so correctness is independent of salt count —
    then phase 2 ranks the ≤ salts·quota survivors per group.  Result
    columns: group, doc_id, order value, final rank.
    """
    order = [F.desc(order_col), F.asc(id_col)]
    salted = docs.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(salts))
    )
    w1 = Window.partitionBy(group_col, "_salt").orderBy(*order)
    phase1 = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= quota)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (
        phase1.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= quota)
        .select(group_col, id_col, order_col, "rank")
    )
