"""The reference's M1 skeleton (SURVEY.md §7) mapped onto the oracle corpus.

The election pipeline's first real query — precinct votes → group-sum →
recode → pivot → NA-fill → ratio → lower (01_DataMerge.R:69-92) — is
re-expressed here against the TPC-H-ish tables so the driver's DuckDB
gate can hash-check the exact operator composition. The real
FIXTURES-shaped pipeline lives in ``plans.election`` and is covered by
pytest with synthetic vote/listing tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.ratios import dem_rep_ratio
from ..registry import query
from ..sources.catalog import load_table


# "Votes per (county, party)" analog: orders per (nation, status).
# Composition parity with 01_DataMerge.R:69-92:
#   group-sum (A1) → pivot with explicit levels (A4) → NA→0 (P8) →
#   ratio F/(F+O) (F8) → lower(name) (F1) — ending in one small keyed
#   table exactly like county_ratios.
@query(
    "nation_status_ratio",
    oracle="""
WITH votes AS (
  SELECT
    LOWER(n.n_name) AS nation,
    o.o_orderstatus AS party,
    COUNT(*)        AS votes
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
), wide AS (
  SELECT
    nation,
    COALESCE(SUM(CASE WHEN party = 'F' THEN votes END), 0) AS f_votes,
    COALESCE(SUM(CASE WHEN party = 'O' THEN votes END), 0) AS o_votes,
    COALESCE(SUM(CASE WHEN party = 'P' THEN votes END), 0) AS p_votes
  FROM votes GROUP BY nation
)
SELECT
  nation,
  CAST(f_votes AS BIGINT) AS f_votes,
  CAST(o_votes AS BIGINT) AS o_votes,
  CAST(p_votes AS BIGINT) AS p_votes,
  f_votes * 1.0 / (f_votes + o_votes) AS ratio
FROM wide
ORDER BY nation
""",
    tags=("A1", "A4", "P8", "F8", "F1", "M1-skeleton"),
)
def nation_status_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    votes = (
        # customer scales with SF (no hint — AQE decides); nation is a
        # fixed 25-row dim and broadcasts unconditionally
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.lower("n_name").alias("nation"),
            F.col("o_orderstatus").alias("party"),
        )
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    wide = (
        votes.groupBy("nation")
        .pivot("party", ["F", "O", "P"])
        .agg(F.first("votes"))
        .na.fill(0)
        .withColumnsRenamed({"F": "f_votes", "O": "o_votes", "P": "p_votes"})
    )
    return wide.select(
        "nation",
        "f_votes",
        "o_votes",
        "p_votes",
        dem_rep_ratio("f_votes", "o_votes").alias("ratio"),
    ).orderBy("nation")
