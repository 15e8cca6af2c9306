"""Beyond-SF relational probe (SCALE.md §11): the corpus family has a
40x probe (§10); this gives the RELATIONAL engine the same evidence.

The driver ships facts up to sf0.1 (~600k lineitem rows). This probe
replicates the fact tables K in {1, 10, 40} times with disjoint
orderkey ranges (dims stay fixed — exactly how a bigger TPC-H SF
grows: fact rows scale, nation/region/customer cardinality per-key
contention grows), then times the four core relational shapes:

- q1 shape : scan + map-side-combined global aggregate (no join)
- q5 shape : 6-table snowflake join + group-by
- q18 shape: group-by-HAVING semijoin back onto the fact table
- q21 shape: EXISTS + NOT EXISTS decorrelated self-joins (suite3's
  hardest member), at K<=10 only (40x of a quadratic-ish shape is a
  different experiment)

Every run materializes through the noop sink. Prints one JSON line:
{"base_rows": ..., "runs": {shape: {K: {rows, wall_sec}}}}.

Linear-or-better wall growth vs K here is the evidence that the
registered plans have no hidden per-row driver work and no
partition-count cliff between 600k and 24M fact rows.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from mbfbigdatarandomforest_spark.session import get_spark  # noqa: E402
from mbfbigdatarandomforest_spark.sources.catalog import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

Q1 = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS sum_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""

Q5 = """
SELECT n_name, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8)))
            AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation nt ON s.s_nationkey = nt.n_nationkey
JOIN region r ON nt.n_regionkey = r.r_regionkey
GROUP BY n_name
"""

Q18 = """
SELECT o.o_orderkey, o.o_totalprice, SUM(l.l_quantity) AS total_qty
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 150
)
GROUP BY o.o_orderkey, o.o_totalprice
"""

Q21 = """
SELECT s_name, COUNT(*) AS n
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate
  )
GROUP BY s_name
"""

SHAPES = {"q1": Q1, "q5": Q5, "q18": Q18, "q21": Q21}


def _replicate(df, key_col: str, k: int, stride: int):
    """K copies with disjoint orderkey ranges; copy 0 is the original."""
    if k == 1:
        return df
    return (
        df.withColumn("__rep", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .withColumn(key_col, F.col(key_col) + F.col("__rep") * F.lit(stride))
        .drop("__rep")
    )


def main() -> None:
    spark = get_spark()
    base = {t: load_table(spark, SF_DIR, t) for t in (
        "lineitem", "orders", "customer", "supplier", "nation", "region"
    )}
    stride = base["orders"].agg(F.max("o_orderkey")).collect()[0][0] + 1
    base_rows = base["lineitem"].count()
    out: dict[str, dict[int, dict[str, float]]] = {s: {} for s in SHAPES}
    for k in (1, 10, 40):
        # materialize the scaled facts to parquet so every shape reads a
        # REAL columnar scan (not an in-memory explode lineage — the
        # probe times the query, not the generator)
        tmp = f"/tmp/rel_probe_k{k}"
        if not os.path.isdir(tmp):
            _replicate(base["lineitem"], "l_orderkey", k, stride).write.mode(
                "overwrite"
            ).parquet(f"{tmp}/lineitem")
            _replicate(base["orders"], "o_orderkey", k, stride).write.mode(
                "overwrite"
            ).parquet(f"{tmp}/orders")
        spark.read.parquet(f"{tmp}/lineitem").createOrReplaceTempView("lineitem")
        spark.read.parquet(f"{tmp}/orders").createOrReplaceTempView("orders")
        for t in ("customer", "supplier", "nation", "region"):
            base[t].createOrReplaceTempView(t)
        for shape, sql in SHAPES.items():
            if shape == "q21" and k > 10:
                continue
            walls = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                spark.sql(sql).write.format("noop").mode("overwrite").save()
                walls.append(time.time() - t0)
            out[shape][k] = {
                "rows": base_rows * k,
                "wall_sec": round(min(walls), 3),
            }
    print(json.dumps({"base_rows": base_rows, "runs": out}))


if __name__ == "__main__":
    main()
