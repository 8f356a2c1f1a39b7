"""Averaged-perceptron POS tagger artifact — the model-grade upgrade
of the orthographic POS/NER heuristics (operators/entities.py), closing
the gap to the reference's model-backed analyzers (_pos_distribution
nlp_analyzer.py:819-850, named_entity_analysis :217-284) without
external dependencies.

The algorithm is Collins' averaged perceptron (EMNLP 2002, public
knowledge; the same structure as the classic textblob-aptagger), built
from scratch:

- ``train_pos_perceptron``: driver-side training on a BOUNDED seeded
  stride-sample of the corpus (the train_bpe / shapiro pattern —
  unbiased Bernoulli draw, deterministic stride cut, no partition-order
  limit()). Sandbox supervision is WEAK LABELS from the heuristic
  tagger (``pos_tag_python``, the Python twin of
  entities.pos_tag_expr) — no treebank ships in this environment — so
  what the model genuinely adds over the CASE expression is learned
  generalization: suffix/prefix/shape feature weights extend tags to
  unseen words, where the heuristic falls back to a 3-rule suffix
  list. Swap the labeled sentences for UD-treebank gold via the
  ``tagged_sents`` parameter and the artifact/UDF contract is
  unchanged — that is the production path.
- Closed-class GUARANTEE: function words (entities.POS_WORD_CLASSES)
  and the NUM regex are dictionary-routed before the perceptron, so
  model and heuristic agree exactly on them (the parity gate tests
  pin this three ways: Catalyst CASE / artifact UDF / Python mirror).
- Deployment shape = plans/models.py: gzip JSON artifact shipped via
  SparkContext.addFile, resolved worker-side with SparkFiles, loaded
  ONCE per Python worker (udfs._worker_cached) inside an ITERATOR
  pandas UDF; the loaded tagger is deliberately non-picklable so
  accidental closure capture fails loudly.
- ``pos_distribution_model`` / ``entity_candidates_model``: the
  operators — tag arrays explode into the same hash-agg plan shape as
  the heuristic versions; model NER chunks consecutive PROPN tags
  (>=2-token runs) plus ALL-CAPS acronyms, mirroring
  entities.ENTITY_PATTERN semantics at the tag level.
"""

from __future__ import annotations

import gzip
import json
import os
import random
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from data_quality_checker_spark.operators.entities import (
    POS_SUFFIX_RULES,
    POS_WORD_CLASSES,
)

__all__ = [
    "pos_tag_python",
    "train_pos_perceptron",
    "write_pos_model",
    "load_pos_model",
    "PerceptronTagger",
    "pos_tags_udf",
    "pos_distribution_model",
    "entity_candidates_model",
]

FORMAT = "dqs-pos-perceptron-v1"
ENV_VAR = "SPARK_DQC_POS_MODEL"

# the heuristic tokenization contract (entities.pos_distribution):
# split on non-alphanumerics, case preserved
_TOKEN_SPLIT = re.compile(r"[^A-Za-z0-9]+")
_NUM_RE = re.compile(r"^[0-9]+([.,][0-9]+)?$")

_CLOSED: dict[str, str] = {
    w: tag for tag, words in POS_WORD_CLASSES.items() for w in words
}
_SUFFIX = [(tag, re.compile(pat)) for tag, pat in POS_SUFFIX_RULES]


def tokenize(text: str) -> list[str]:
    return [t for t in _TOKEN_SPLIT.split(text or "") if t]


def pos_tag_python(token: str) -> str:
    """Python twin of entities.pos_tag_expr (same evaluation order) —
    the weak-label source for sandbox training."""
    low = token.lower()
    tag = _CLOSED.get(low)
    if tag is not None:
        return tag
    if _NUM_RE.match(token):
        return "NUM"
    if re.match(r"^[A-Z]", token):
        return "PROPN"
    for name, pat in _SUFFIX:
        if pat.search(low):
            return name
    return "NOUN"


def _features(
    i: int, word: str, context: list[str], prev: str, prev2: str
) -> list[str]:
    """Honnibal-style feature set (public knowledge); context is the
    token list padded with -START-/-END- sentinels at both ends, so
    ``context[i+2]`` is the current word."""
    w = context[i + 2]
    low = w.lower()
    feats = [
        "bias",
        f"w={low}",
        f"suf3={low[-3:]}",
        f"suf2={low[-2:]}",
        f"pre1={low[:1]}",
        f"t-1={prev}",
        f"t-2={prev2}",
        f"t-1t-2={prev}|{prev2}",
        f"w-1={context[i + 1].lower()}",
        f"w-1suf3={context[i + 1].lower()[-3:]}",
        f"w-2={context[i].lower()}",
        f"w+1={context[i + 3].lower()}",
        f"w+1suf3={context[i + 3].lower()[-3:]}",
        f"w+2={context[i + 4].lower()}",
    ]
    if w.isupper() and len(w) >= 2:
        feats.append("shape=UPPER")
    elif w[:1].isupper():
        feats.append("shape=Title")
    if any(c.isdigit() for c in w):
        feats.append("shape=digit")
    return feats


class PerceptronTagger:
    """Loaded artifact: dictionary-routed closed classes + averaged-
    perceptron scoring for open-class words. Deliberately not
    picklable (models.py contract — ship the FILE, load worker-side).
    """

    def __init__(self, classes: list[str], weights: dict[str, dict[str, float]]):
        self.classes = sorted(classes)
        self.weights = weights

    def __reduce__(self):
        raise TypeError(
            "PerceptronTagger is not picklable; ship the artifact with "
            "SparkContext.addFile and load it worker-side via "
            "SparkFiles.get"
        )

    def _predict(self, feats: list[str]) -> str:
        scores: dict[str, float] = {}
        for f in feats:
            table = self.weights.get(f)
            if not table:
                continue
            for tag, w in table.items():
                scores[tag] = scores.get(tag, 0.0) + w
        if not scores:
            return "NOUN"
        # deterministic argmax: score desc, tag name asc
        return max(self.classes, key=lambda t: (scores.get(t, 0.0), ))

    def tag(self, tokens: list[str]) -> list[str]:
        out: list[str] = []
        prev, prev2 = "-START-", "-START2-"
        context = ["-S2-", "-S1-", *tokens, "-E1-", "-E2-"]
        for i, w in enumerate(tokens):
            tag = _CLOSED.get(w.lower())
            if tag is None and _NUM_RE.match(w):
                tag = "NUM"
            if tag is None:
                tag = self._predict(_features(i, w, context, prev, prev2))
            out.append(tag)
            prev2, prev = prev, tag
        return out


def train_pos_perceptron(
    df: DataFrame | None = None,
    text_col: str = "text",
    tagged_sents: list[list[tuple[str, str]]] | None = None,
    sample_docs: int = 1000,
    n_iter: int = 5,
    seed: int = 42,
) -> dict:
    """Collins averaged-perceptron training. Either pass gold
    ``tagged_sents`` (the production path — UD treebank etc.) or a
    corpus ``df`` whose sentences are weak-labeled by
    :func:`pos_tag_python`. Returns the serializable model payload
    (pass to :func:`write_pos_model`). Deterministic for a given
    (input, seed): per-epoch shuffling uses random.Random(seed) and
    ties break on tag name."""
    if tagged_sents is None:
        if df is None:
            raise ValueError("need df or tagged_sents")
        from data_quality_checker_spark.plans.sampling import (
            stride_sample_column,
        )

        texts = stride_sample_column(df, text_col, sample_docs, seed=seed)
        tagged_sents = [
            [(t, pos_tag_python(t)) for t in tokenize(x)]
            for x in texts
            if tokenize(x)
        ]
    classes = sorted({t for s in tagged_sents for _, t in s})
    weights: dict[str, dict[str, float]] = {}
    totals: dict[tuple[str, str], float] = {}
    tstamps: dict[tuple[str, str], int] = {}
    instances = 0
    rng = random.Random(seed)

    def upd(feat: str, tag: str, delta: float) -> None:
        key = (feat, tag)
        table = weights.setdefault(feat, {})
        totals[key] = totals.get(key, 0.0) + (
            instances - tstamps.get(key, 0)
        ) * table.get(tag, 0.0)
        tstamps[key] = instances
        table[tag] = table.get(tag, 0.0) + delta

    order = list(range(len(tagged_sents)))
    for _ in range(n_iter):
        rng.shuffle(order)
        for si in order:
            sent = tagged_sents[si]
            tokens = [w for w, _ in sent]
            context = ["-S2-", "-S1-", *tokens, "-E1-", "-E2-"]
            prev, prev2 = "-START-", "-START2-"
            for i, (w, truth) in enumerate(sent):
                dict_tag = _CLOSED.get(w.lower())
                if dict_tag is None and _NUM_RE.match(w):
                    dict_tag = "NUM"
                if dict_tag is not None:
                    prev2, prev = prev, dict_tag
                    continue
                instances += 1
                feats = _features(i, w, context, prev, prev2)
                scores: dict[str, float] = {}
                for f in feats:
                    for tag, wt in weights.get(f, {}).items():
                        scores[tag] = scores.get(tag, 0.0) + wt
                guess = max(
                    classes, key=lambda t: (scores.get(t, 0.0), )
                ) if scores else "NOUN"
                if guess != truth:
                    for f in feats:
                        upd(f, truth, 1.0)
                        upd(f, guess, -1.0)
                prev2, prev = prev, guess
    # average: final weight = accumulated total / #instances
    averaged: dict[str, dict[str, float]] = {}
    for feat, table in weights.items():
        for tag, w in table.items():
            key = (feat, tag)
            total = totals.get(key, 0.0) + (
                instances - tstamps.get(key, 0)
            ) * w
            avg = round(total / max(instances, 1), 6)
            if avg:
                averaged.setdefault(feat, {})[tag] = avg
    return {"format": FORMAT, "classes": classes, "weights": averaged}


def write_pos_model(path: str, payload: dict) -> str:
    with gzip.open(path, "wt", encoding="utf-8") as fh:
        json.dump(payload, fh)
    return path


def load_pos_model(path: str) -> PerceptronTagger:
    with gzip.open(path, "rt", encoding="utf-8") as fh:
        payload = json.load(fh)
    if payload.get("format") != FORMAT:
        raise ValueError(f"not a {FORMAT} artifact: {path}")
    return PerceptronTagger(payload["classes"], payload["weights"])


def pos_tags_python(text: str | None, tagger: PerceptronTagger) -> list[str]:
    """Pure-Python mirror of the UDF path (parity oracle)."""
    if not text:
        return []
    return tagger.tag(tokenize(text))


_UDF_CACHE: dict = {}


def pos_tags_udf(col, model_path: str | None = None):
    """Iterator pandas UDF: array<string> POS tags per document. The
    artifact path travels in the closure; the tagger loads once per
    Python worker (udfs._worker_cached) from the addFile copy."""
    path = model_path or os.environ.get(ENV_VAR)
    if not path:
        raise ValueError(
            f"pos_tags_udf needs a model path (arg or ${ENV_VAR})"
        )
    if path not in _UDF_CACHE:

        @pandas_udf("array<string>")
        def _tags(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            from data_quality_checker_spark.plans import models
            from data_quality_checker_spark.plans.udfs import _worker_cached

            local = models.resolve_artifact(path) or path
            tagger = _worker_cached(("pos", local), lambda: load_pos_model(local))
            for batch in batches:
                yield batch.map(
                    lambda t: tagger.tag(tokenize(t))
                    if isinstance(t, str)
                    else []
                )

        _UDF_CACHE[path] = _tags
    return _UDF_CACHE[path](col)


def pos_distribution_model(
    df: DataFrame, model_path: str, text_col: str = "text"
) -> DataFrame:
    """(pos, n, pct) — same output contract and plan shape as the
    heuristic entities.pos_distribution (explode -> hash agg -> tiny
    window), tags from the artifact instead of the CASE expression."""
    from pyspark.sql import Window

    tagged = (
        df.filter(F.col(text_col).isNotNull())
        .select(pos_tags_udf(F.col(text_col), model_path).alias("_tags"))
        .select(F.explode("_tags").alias("pos"))
    )
    counts = tagged.groupBy("pos").agg(F.count(F.lit(1)).alias("n"))
    total = Window.partitionBy()
    return counts.select(
        "pos", "n", (F.col("n") / F.sum("n").over(total)).alias("pct")
    )


def entity_candidates_model(
    df: DataFrame,
    model_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Model-graded NER candidates: chunk runs of >=2 consecutive
    PROPN-tagged tokens (plus lone ALL-CAPS acronyms), the tag-level
    counterpart of entities.ENTITY_PATTERN. A token joins a run only
    when BOTH the tag is PROPN and the surface form is capitalized —
    sentence-boundary features can push lowercase sentence-initial
    words to PROPN, and NER surface forms need the orthographic
    evidence regardless (same contract as ENTITY_PATTERN). Output
    (id, entity) like entity_candidates; one UDF pass + explode, no
    shuffle."""
    path = model_path

    @pandas_udf("array<string>")
    def _ents(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from data_quality_checker_spark.plans import models
        from data_quality_checker_spark.plans.udfs import _worker_cached

        local = models.resolve_artifact(path) or path
        tagger = _worker_cached(("pos", local), lambda: load_pos_model(local))

        def one(text):
            if not isinstance(text, str) or not text:
                return []
            toks = tokenize(text)
            tags = tagger.tag(toks)
            out, run = [], []
            for w, t in zip(toks, tags):
                if t == "PROPN" and w[:1].isupper():
                    run.append(w)
                    continue
                if len(run) >= 2:
                    out.append(" ".join(run))
                elif len(run) == 1 and run[0].isupper() and len(run[0]) >= 2:
                    out.append(run[0])
                run = []
            if len(run) >= 2:
                out.append(" ".join(run))
            elif len(run) == 1 and run[0].isupper() and len(run[0]) >= 2:
                out.append(run[0])
            return out

        for batch in batches:
            yield batch.map(one)

    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.explode(_ents(F.col(text_col))).alias("entity"),
        )
    )
