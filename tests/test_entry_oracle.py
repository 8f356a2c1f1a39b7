"""Driver-contract guard: a representative subset of __spark_entry__
queries cross-checked against their DuckDB oracles at sf0.001 (the full
set runs via tools/check_oracle.py at sf0.01)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from data_quality_checker_spark.sources.io import TABLES
from tools.check_oracle import frame_fingerprint

SUBSET = [
    "pricing_summary",
    "missing_values",
    "outliers_zscore",
    "rolling_forecast",
    "serial_correlation",
    "psi",
    "text_stats",
    "langid_counts",
    "quality_verdict",
    "scrubbed_digest",
    "minhash_signatures",
    "minhash_index_query",
    "doc_fingerprint",
    "ann_topk",
    "multimodal_features",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = entrymod.queries()[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(entrymod.oracle_sql()[name])
    drows = rel.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert frame_fingerprint(sdf.columns, srows) == frame_fingerprint(
        list(rel.columns), drows
    )


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "doc_id", "keep", "n_fired", "lang_detected", "scrub_md5",
    }
    # every oracle key corresponds to a query
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
