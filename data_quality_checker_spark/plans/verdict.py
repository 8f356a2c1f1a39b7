"""Verdict assembly: rule flags -> fired_rules array -> keep boolean.

Per-rule boolean columns are retained (null-safe, coalesced to false)
so the metrics stage can aggregate rule-level drop counts without
re-evaluating rules (generalizes generate_report, dq_checker.py:33-45).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_quality_checker_spark.plans.rules import (
    RULE_NAMES,
    RuleConfig,
    rule_exprs,
)

RULE_PREFIX = "rule_"


def with_rule_flags(
    df: DataFrame, cfg: RuleConfig | None = None, text_col: str = "text"
) -> DataFrame:
    cfg = cfg or RuleConfig()
    flags = {
        f"{RULE_PREFIX}{name}": F.coalesce(expr, F.lit(False))
        for name, expr in rule_exprs(cfg, text_col).items()
    }
    return df.withColumns(flags)


def with_verdict(df: DataFrame, cfg: RuleConfig | None = None) -> DataFrame:
    """Adds fired_rules (array<string>, rule order) and keep (bool)."""
    cfg = cfg or RuleConfig()
    names = list(RULE_NAMES)
    fired = F.array_compact(
        F.array(
            *[
                F.when(F.col(f"{RULE_PREFIX}{n}"), F.lit(n))
                for n in names
            ]
        )
    )
    return df.withColumn("fired_rules", fired).withColumn(
        "keep", F.size("fired_rules") == 0
    )
