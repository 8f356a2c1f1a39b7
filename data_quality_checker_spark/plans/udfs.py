"""Arrow-vectorized pandas UDFs — the ONLY JVM->Python crossings in the
engine, in iterator form so per-worker state (models) loads once per
executor process, not once per batch (SURVEY.md §2.12, input_hint
mandate: no per-row Python UDFs).

 - langid_udf: fastText when available (model shipped via
   SparkContext.addFile + SPARK_DQC_FASTTEXT_MODEL), else a
   deterministic stopword-argmax scorer contract-identical to the
   pure-SQL `functions.text.langid_best` (nlp_analyzer.py:887-900).
 - perplexity_udf: KenLM-style n-gram perplexity slot
   (nlp_analyzer.py:321-349). KenLM isn't in this environment, so the
   default model is a deterministic hash-trigram LM (md5-seeded token
   trigram logprobs) — same plumbing, swappable scorer.
"""

from __future__ import annotations

import hashlib
import math
import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf

from data_quality_checker_spark.functions.wordlists import LANGS, STOPWORDS

_TOKEN_RE = re.compile(r"\s+")


def _tokens(text: str) -> list[str]:
    return [t for t in _TOKEN_RE.split(text.lower()) if t]


def detect_lang_python(text: str | None) -> str:
    """The deterministic fallback scorer — shared with plans/oracle.py
    so Spark/oracle agree by construction."""
    if text is None:
        return "und"
    toks = _tokens(text)
    sets = {lang: set(STOPWORDS[lang]) for lang in LANGS}
    best_lang, best = "und", 0
    for lang in LANGS:  # fixed order = deterministic tie-break
        score = sum(1 for t in toks if t in sets[lang])
        if score > best:
            best_lang, best = lang, score
    return best_lang


def trigram_logprob(tri: str) -> float:
    """Deterministic pseudo-LM: md5(trigram) -> p in (0, 1]."""
    h = int.from_bytes(hashlib.md5(tri.encode()).digest()[:4], "big")
    return math.log((1 + h % 1000) / 1001.0)


def perplexity_python(text: str | None) -> float | None:
    if text is None:
        return None
    toks = _tokens(text)
    if len(toks) < 3:
        return None
    lps = [
        trigram_logprob(" ".join(toks[i : i + 3]))
        for i in range(len(toks) - 2)
    ]
    return math.exp(-sum(lps) / len(lps))


# pandas_udf parses its DDL return type eagerly, which needs a live
# SparkSession — so the udfs are built lazily and cached.
_UDF_CACHE: dict[str, object] = {}


def langid_udf(col):
    """Iterator-form pandas UDF: model loads once per Python worker."""
    if "langid" not in _UDF_CACHE:

        @pandas_udf("string")
        def _langid(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            model = None
            model_path = os.environ.get("SPARK_DQC_FASTTEXT_MODEL")
            if model_path:
                try:  # pragma: no cover - fastText absent in this sandbox
                    import fasttext

                    from pyspark import SparkFiles

                    local = SparkFiles.get(os.path.basename(model_path))
                    model = fasttext.load_model(
                        local if os.path.exists(local) else model_path
                    )
                except Exception:
                    model = None
            for batch in batches:
                if model is not None:  # pragma: no cover
                    labels = [
                        model.predict(t.replace("\n", " "))[0][0].replace(
                            "__label__", ""
                        )
                        if isinstance(t, str)
                        else "und"
                        for t in batch
                    ]
                    yield pd.Series(labels)
                else:
                    yield batch.map(detect_lang_python)

        _UDF_CACHE["langid"] = _langid
    return _UDF_CACHE["langid"](col)


def perplexity_udf(col):
    if "ppl" not in _UDF_CACHE:

        @pandas_udf("double")
        def _ppl(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for batch in batches:
                yield batch.map(perplexity_python)

        _UDF_CACHE["ppl"] = _ppl
    return _UDF_CACHE["ppl"](col)
