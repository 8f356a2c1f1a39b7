"""Model-based anomaly detection: Isolation Forest, the real algorithm.

The reference calls sklearn.ensemble.IsolationForest
(stat_analyzer.py 'detect_anomalies' / dq_checker 'check_outliers'
isolation_forest branch); sklearn is absent here, but the ORIGINAL
algorithm (Liu, Ting, Zhou 2008) is sample-trained by design — each
tree isolates a psi=256-row subsample — so the training data is
bounded driver-side regardless of corpus size. This module implements
it in plain numpy:

 - fit: n_trees random binary trees over per-tree subsamples (random
   feature, random split in the feature's observed range, grown to
   isolation or the ceil(log2(psi)) height limit).
 - score: distributed, via an iterator pandas UDF — the (small, plain
   python) forest travels in the closure once per executor, rows score
   in Arrow batches. anomaly score s(x) = 2^(-E[path length]/c(psi)),
   s -> 1 for anomalies, ~0.5 for inliers (the paper's normalization).
"""

from __future__ import annotations

import math
import random
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["IsolationForest", "fit_isolation_forest", "score_anomalies"]


def _c(n: int) -> float:
    """Average unsuccessful-search path length in a BST of n nodes —
    the paper's normalizer."""
    if n <= 1:
        return 0.0
    h = math.log(n - 1) + 0.5772156649015329  # harmonic approx
    return 2.0 * h - 2.0 * (n - 1) / n


def _build_tree(x: "np.ndarray", height_limit: int, rng: random.Random):
    """Recursive (feature, split, left, right) tuples; a leaf is
    ('leaf', n_rows)."""
    n = len(x)
    if n <= 1 or height_limit == 0:
        return ("leaf", n)
    f = rng.randrange(x.shape[1])
    lo, hi = float(x[:, f].min()), float(x[:, f].max())
    if lo == hi:
        return ("leaf", n)
    split = rng.uniform(lo, hi)
    mask = x[:, f] < split
    return (
        f,
        split,
        _build_tree(x[mask], height_limit - 1, rng),
        _build_tree(x[~mask], height_limit - 1, rng),
    )


def _path_length(tree, row: "np.ndarray", depth: int = 0) -> float:
    if tree[0] == "leaf":
        return depth + _c(tree[1])
    f, split, left, right = tree
    return _path_length(left if row[f] < split else right, row, depth + 1)


class IsolationForest:
    def __init__(self, trees: list, psi: int, cols: list[str]):
        self.trees = trees
        self.psi = psi
        self.cols = cols

    def score(self, row: "np.ndarray") -> float:
        e = sum(_path_length(t, row) for t in self.trees) / len(self.trees)
        return 2.0 ** (-e / _c(self.psi))


def fit_isolation_forest(
    df: DataFrame,
    cols: list[str],
    n_trees: int = 100,
    sample_size: int = 256,
    seed: int = 42,
) -> IsolationForest:
    """Fit on a bounded random sample (n_trees * sample_size rows max —
    the algorithm's own design; never a full collect). Sampling uses a
    seeded Spark sample for determinism-per-plan."""
    need = n_trees * sample_size
    total = df.count()
    frac = min(1.0, (need * 1.2) / max(total, 1))
    rows = (
        df.select(*cols)
        .na.drop()
        .sample(fraction=frac, seed=seed)
        .limit(need)
        .collect()
    )
    if not rows:
        raise ValueError(
            "fit_isolation_forest: no training rows — the DataFrame "
            f"is empty or every row has a null in {cols}"
        )
    x = np.array([[float(r[c]) for c in cols] for r in rows])
    rng = random.Random(seed)
    height = math.ceil(math.log2(max(sample_size, 2)))
    trees = []
    for _ in range(n_trees):
        idx = [rng.randrange(len(x)) for _ in range(min(sample_size, len(x)))]
        trees.append(_build_tree(x[idx], height, rng))
    return IsolationForest(trees, min(sample_size, len(x)), list(cols))


def score_anomalies(
    df: DataFrame, forest: IsolationForest, out_col: str = "anomaly_score"
) -> DataFrame:
    """Adds the iForest anomaly score, distributed: the forest rides
    the closure to each executor once; rows score in Arrow batches via
    an iterator pandas UDF (no per-row Python)."""
    from pyspark.sql.functions import pandas_udf

    cols = forest.cols
    trees, psi = forest.trees, forest.psi

    @pandas_udf("double")
    def _score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # the struct input arrives as a pd.DataFrame at runtime (the
        # Series type hint only selects the iterator eval type)
        f = IsolationForest(trees, psi, cols)
        for pdf in batches:
            x = pdf[cols].to_numpy(dtype="float64")
            yield pd.Series([f.score(r) for r in x])

    struct = F.struct(*cols)
    # pandas_udf over a struct yields a DataFrame batch with the fields
    return df.withColumn(out_col, _score(struct))
