"""Build a 10x key-shifted replica of the sf0.1 fixtures under
/tmp/testdata_scaled/sf1.0 — a ROBUSTNESS smoke for the bench at a
larger scale factor (the driver may measure at one; config tuned only
to 600k-row tables must not regress there). Not an oracle corpus:
values are never compared, only that every query runs and scales
sanely. Key columns shift by copy*10_000_000 so FK relationships
survive; document texts get a per-copy suffix so the near-dup
machinery is fully engaged rather than collapsed by exact-text
grouping.
Usage: python tools/make_scaled_fixture.py [copies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_quality_checker_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/testdata_scaled/sf1.0"
OFF = 10_000_000

KEYS = {
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "nation": [],
    "region": [],
}
# nation/region are tiny dimensions joined by key — copy once, do not
# shift (shifted fact FKs to them would dangle); nationkey shifts
# above therefore only apply to tables NOT joined back to nation in
# any declared query at this scale... they are (local_supplier_volume
# joins nation/region), so keep nationkeys UNSHIFTED everywhere.
NO_SHIFT = {"c_nationkey", "s_nationkey"}


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(
        "make-scaled", master="local[32]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    for tbl, keys in KEYS.items():
        src = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        if not keys or tbl in ("nation", "region"):
            out = src
        else:
            parts = []
            for c in range(copies):
                d = src
                for k in keys:
                    if k in NO_SHIFT:
                        continue
                    d = d.withColumn(k, F.col(k) + F.lit(c * OFF))
                if tbl == "documents" and "text" in src.columns:
                    if c > 0:
                        d = d.withColumn(
                            "text",
                            F.when(
                                F.col("text").isNotNull(),
                                F.concat(
                                    F.col("text"),
                                    F.lit(f" replica marker c{c}"),
                                ),
                            ),
                        )
                parts.append(d)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        n = 32 if tbl in ("lineitem", "events", "orders") else 8
        out.repartition(n).write.mode("overwrite").parquet(
            f"{DST}/{tbl}.parquet"
        )
        print(tbl, "written")
    print("done:", DST)


if __name__ == "__main__":
    main()
