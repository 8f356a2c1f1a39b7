"""Driver-style correctness harness: runs every __spark_entry__ query
on Spark and its oracle SQL on DuckDB over the same parquet, compares
row count, sorted schema names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from data_quality_checker_spark.session import get_spark  # noqa: E402
from data_quality_checker_spark.sources.io import TABLES  # noqa: E402


def norm_cell(v):
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 6))
    return str(v)


def frame_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from "
            f"'{sf_dir}/{t}.parquet'"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            # release any operator-attached cache handles (drift's
            # prefix_sums, minhash intermediates): a 98-query loop in
            # one session must not accumulate executor storage
            for dep in getattr(sdf, "_cached_deps", ()):
                dep.unpersist()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(
                f"rows  {name}: {len(srows)} rows (rows-only check) "
                f"[{time.time() - t0:.1f}s]"
            )
            n_rows_only += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c for c in rel.columns]
            dtypes = [str(t).upper() for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        # the driver's value-hasher distinguishes arrow-level types this
        # stringify-normalizing checker doesn't: a DuckDB HUGEINT or
        # DECIMAL column (e.g. sum(int)+1) hash-mismatches a Spark
        # BIGINT even when every value is equal (round-1 sessionization
        # failure). Surface the risk loudly so twins cast explicitly.
        sfields = {f.name: f.dataType.simpleString() for f in sdf.schema}
        for c, t in zip(dcols, dtypes):
            risky = t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL")
            if risky and not sfields.get(c, "").startswith("decimal"):
                print(
                    f"WARN  {name}: oracle column '{c}' is {t} but the "
                    f"Spark side is {sfields.get(c)} — the DRIVER hash "
                    "will mismatch; add an explicit ::BIGINT/::DOUBLE "
                    "cast to the twin"
                )
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            hs = frame_fingerprint(scols, srows)
            hd = frame_fingerprint(dcols, drows)
            if hs != hd:
                problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if "value-hash mismatch" in problems and len(srows) <= 2000:
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                set_s = {
                    tuple(norm_cell(r[i]) for i in order_s) for r in srows
                }
                set_d = {
                    tuple(norm_cell(r[i]) for i in order_d) for r in drows
                }
                for x in list(set_s - set_d)[:3]:
                    print("    spark-only:", x)
                for x in list(set_d - set_s)[:3]:
                    print("    duck-only :", x)
            n_fail += 1
        else:
            print(
                f"PASS  {name}: {len(srows)} rows "
                f"[{time.time() - t0:.1f}s]"
            )
            n_pass += 1
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"of {len([q for q in qs if not only or q in only])}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
