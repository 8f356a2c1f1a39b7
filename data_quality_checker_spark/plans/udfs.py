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

# worker-side model cache: an iterator pandas UDF's body re-runs per
# TASK, so without this a reused Python worker re-reads and re-parses
# the artifact thousands of times per job (the once-per-worker load
# the design promises happens HERE, not merely via the driver-side
# _UDF_CACHE of the udf object)
_WORKER_MODEL_CACHE: dict = {}


def _worker_cached(key, loader):
    if key not in _WORKER_MODEL_CACHE:
        _WORKER_MODEL_CACHE[key] = loader()
    return _WORKER_MODEL_CACHE[key]


# the pinned engine tokenization class (oracle.py / models.py / Java
# \s) — Python's unicode \s would also split on NBSP etc. and diverge
# from langid_best / the oracle on unicode-whitespace text, breaking
# the F1 parity invariant (review finding, reproduced)
_TOKEN_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def _tokens(text: str) -> list[str]:
    return [t for t in _TOKEN_RE.split(text.lower()) if t]


def detect_lang_python(
    text: str | None, toks: list[str] | None = None
) -> str:
    """The deterministic fallback scorer — shared with plans/oracle.py
    so Spark/oracle agree by construction. ``toks`` lets a caller
    supply its own tokenization (oracle.py pins the Java-\\s class,
    which is narrower than Python's unicode \\s)."""
    if text is None:
        return "und"
    if toks is None:
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


def langid_udf(col, model_path: str | None = None):
    """Iterator-form pandas UDF: model loads once per Python worker.

    Model resolution, decided DRIVER-side at UDF construction (only the
    path string travels in the closure — the loaded model object is not
    picklable, by design; it is loaded worker-side from the artifact
    SparkContext.addFile distributed):
     1. explicit ``model_path`` / $SPARK_DQC_LANGID_MODEL -> gzip
        wordlist artifact (plans/models.py; exercised in tests with a
        real file and a non-picklable loaded object)
     2. $SPARK_DQC_FASTTEXT_MODEL -> fastText binary, same distribution
        path (fastText absent in this sandbox)
     3. deterministic stopword-argmax fallback, contract-identical to
        functions/text.langid_best
    """
    wl_path = model_path or os.environ.get("SPARK_DQC_LANGID_MODEL")
    ft_path = os.environ.get("SPARK_DQC_FASTTEXT_MODEL")
    cache_key = ("langid", wl_path, ft_path)
    if cache_key not in _UDF_CACHE:

        @pandas_udf("string")
        def _langid(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            predict = None
            if wl_path:
                from data_quality_checker_spark.plans import models

                local = models.resolve_artifact(wl_path)
                if local:
                    # ONE worker-side model instance shared with
                    # langid_conf_udf (key parity): caching a bound
                    # .predict under a separate key used to load the
                    # count tables twice per worker when a session used
                    # both UDFs — double executor memory for large
                    # artifacts
                    predict = _worker_cached(
                        ("langid_model", local),
                        lambda: models.load_langid_model(local),
                    ).predict
            if predict is None and ft_path:
                try:  # pragma: no cover - fastText not in sandbox
                    import fasttext

                    from data_quality_checker_spark.plans import models

                    local = models.resolve_artifact(ft_path)
                    ft = _worker_cached(
                        ("fasttext", local or ft_path),
                        lambda: fasttext.load_model(local or ft_path),
                    )
                    predict = lambda t: ft.predict(  # noqa: E731
                        t.replace("\n", " ")
                    )[0][0].replace("__label__", "")
                except Exception:
                    predict = None
            for batch in batches:
                if predict is not None:
                    yield pd.Series(
                        [
                            predict(t) if isinstance(t, str) else "und"
                            for t in batch
                        ]
                    )
                else:
                    yield batch.map(detect_lang_python)

        _UDF_CACHE[cache_key] = _langid
    return _UDF_CACHE[cache_key](col)


def langid_conf_udf(col, model_path: str | None = None):
    """Iterator pandas UDF returning struct<lang string, confidence
    double> — the trained-artifact path with CALIBRATED confidence
    (plans/langid.CharNgramLangID.predict_with_confidence). Same
    addFile/SparkFiles distribution and once-per-worker load as
    langid_udf. A wordlist artifact (no confidence semantics) or the
    heuristic fallback yields confidence NULL — downstream thresholds
    then no-op instead of silently passing/failing everything."""
    wl_path = model_path or os.environ.get("SPARK_DQC_LANGID_MODEL")
    cache_key = ("langid_conf", wl_path)
    if cache_key not in _UDF_CACHE:

        @pandas_udf("struct<lang: string, confidence: double>")
        def _langid_conf(
            batches: Iterator[pd.Series],
        ) -> Iterator[pd.DataFrame]:
            predict_conf = None
            if wl_path:
                from data_quality_checker_spark.plans import models

                local = models.resolve_artifact(wl_path)
                if local:
                    # SHARED cache key with langid_udf: both UDFs hold
                    # the same worker-side model instance, so a session
                    # using both loads the count tables once per worker
                    m = _worker_cached(
                        ("langid_model", local),
                        lambda: models.load_langid_model(local),
                    )
                    pwc = getattr(m, "predict_with_confidence", None)
                    if pwc is not None:
                        predict_conf = pwc
                    else:  # wordlist artifact: label only
                        predict_conf = lambda t: (m.predict(t), None)  # noqa: E731
            for batch in batches:
                if predict_conf is not None:
                    rows = [
                        predict_conf(t)
                        if isinstance(t, str)
                        else ("und", 0.0)
                        for t in batch
                    ]
                else:
                    rows = [
                        (detect_lang_python(t), None)
                        if isinstance(t, str)
                        else ("und", 0.0)
                        for t in batch
                    ]
                # struct return type: the iterator must yield
                # DataFrames (one column per struct field), not Series
                yield pd.DataFrame(
                    {
                        "lang": [lg for lg, _ in rows],
                        "confidence": [cf for _, cf in rows],
                    }
                )

        _UDF_CACHE[cache_key] = _langid_conf
    return _UDF_CACHE[cache_key](col)


def perplexity_udf(col, model_path: str | None = None):
    """Iterator pandas UDF. With ``model_path`` (or
    $SPARK_DQC_TRIGRAM_LM), a trained trigram LM artifact
    (plans/lm.py — real counts, KenLM deployment shape) is loaded once
    per worker via SparkFiles; otherwise the deterministic hash-trigram
    fallback scores (same plumbing)."""
    lm_path = model_path or os.environ.get("SPARK_DQC_TRIGRAM_LM")
    cache_key = ("ppl", lm_path)
    if cache_key not in _UDF_CACHE:

        @pandas_udf("double")
        def _ppl(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            scorer = perplexity_python
            if lm_path:
                from data_quality_checker_spark.plans import lm, models

                local = models.resolve_artifact(lm_path)
                if local:
                    scorer = _worker_cached(
                        ("lm", local),
                        lambda: lm.load_trigram_lm(local),
                    ).perplexity
            for batch in batches:
                yield batch.map(scorer)

        _UDF_CACHE[cache_key] = _ppl
    return _UDF_CACHE[cache_key](col)
