"""Worker-side model artifacts for the iterator pandas UDFs.

The reference loads NLP models per call on the driver
(nlp_analyzer.py:887-900 langdetect, :321-349 textstat); at cluster
scale a model must instead be (a) shipped to every executor as a FILE
(SparkContext.addFile -> SparkFiles.get — model objects are usually not
picklable, so closure capture is not an option), and (b) loaded ONCE
per Python worker inside an iterator UDF, not per batch.

fastText/KenLM binaries aren't in this environment, so the real
artifact exercised here is a gzip wordlist language-ID model:

    {"format": "dqs-langid-wordlist-v1",
     "langs": [...], "weights": {lang: {token: weight}}}

With unit weights it is contract-identical to the stopword-argmax
heuristic (functions/text.langid_best and plans/udfs.detect_lang_python)
— the parity test pins that — while the loader returns a deliberately
NON-picklable object, mirroring fastText model semantics, so any
accidental closure capture of the model fails loudly instead of
silently serializing per task.
"""

from __future__ import annotations

import gzip
import json
import os
import re

# the engine tokenization contract: Java \s == [ \t\n\x0B\f\r]
_WS = re.compile(r"[ \t\n\x0b\f\r]+")

from data_quality_checker_spark.functions.wordlists import LANGS, STOPWORDS

FORMAT = "dqs-langid-wordlist-v1"

# Executors discover the shipped artifact through this env var (set
# spark.executorEnv.SPARK_DQC_LANGID_MODEL on a real cluster; plain
# os.environ suffices in local mode). Value = path passed to addFile.
ENV_VAR = "SPARK_DQC_LANGID_MODEL"


def write_langid_model(
    path: str,
    weights: dict[str, dict[str, float]] | None = None,
) -> str:
    """Serialize a wordlist langid model. Default weights: 1.0 per
    stopword of every built-in language — the model-path twin of the
    heuristic scorer."""
    if weights is None:
        weights = {
            lang: {w: 1.0 for w in STOPWORDS[lang]} for lang in LANGS
        }
    payload = {
        "format": FORMAT,
        "langs": list(weights),
        "weights": weights,
    }
    with gzip.open(path, "wt", encoding="utf-8") as fh:
        json.dump(payload, fh)
    return path


class WordlistLangID:
    """Loaded model: weighted stopword argmax with declaration-order
    tie-break (same contract as detect_lang_python). Deliberately not
    picklable — real model handles (fastText, KenLM) never are, and the
    SparkFiles path must not depend on driver-side serialization."""

    def __init__(self, langs: list[str], weights: dict[str, dict[str, float]]):
        self.langs = langs
        self.weights = {k: dict(v) for k, v in weights.items()}

    def __reduce__(self):  # emulate fastText: loaded models don't pickle
        raise TypeError(
            "WordlistLangID is not picklable; ship the artifact with "
            "SparkContext.addFile and load it worker-side via "
            "SparkFiles.get"
        )

    def predict(self, text: str | None) -> str:
        if text is None:
            return "und"
        toks = [t for t in _WS.split(text.lower()) if t]
        best_lang, best = "und", 0.0
        for lang in self.langs:
            table = self.weights[lang]
            score = sum(table.get(t, 0.0) for t in toks)
            if score > best:
                best_lang, best = lang, score
        return best_lang


def load_langid_model(path: str):
    """Load a langid artifact, dispatching on its format string:
    the wordlist stand-in (this module) or the trained char-n-gram
    multinomial (plans/langid.py, dqs-langid-charngram-v1). Both
    loaders return a non-picklable object with ``.predict(text)`` —
    the only contract plans/udfs.langid_udf needs.

    This loader handles ONLY the repo's gzip-json artifact formats —
    a fastText .bin is NOT one of them (that path is
    $SPARK_DQC_FASTTEXT_MODEL + langid_impl='udf' via
    plans/udfs.langid_udf, which imports fasttext when present);
    detect the mismatch here with an actionable error instead of a
    worker-side BadGzipFile."""
    try:
        with gzip.open(path, "rt", encoding="utf-8") as fh:
            payload = json.load(fh)
    except (OSError, UnicodeDecodeError, json.JSONDecodeError) as exc:
        raise ValueError(
            f"{path} is not a gzip-json langid artifact (fastText "
            f".bin models route via $SPARK_DQC_FASTTEXT_MODEL with "
            f"langid_impl='udf', not langid_model_path): {exc}"
        ) from exc
    fmt = payload.get("format")
    if fmt == FORMAT:
        return WordlistLangID(payload["langs"], payload["weights"])
    from data_quality_checker_spark.plans.langid import (
        CHARNGRAM_FORMAT,
        charngram_from_payload,
    )

    if fmt == CHARNGRAM_FORMAT:
        return charngram_from_payload(payload, path)
    raise ValueError(
        f"not a {FORMAT} or {CHARNGRAM_FORMAT} artifact: {path}"
    )


def resolve_artifact(env_value: str) -> str | None:
    """Worker-side artifact resolution: prefer the SparkFiles copy that
    addFile distributed; fall back to the literal path (shared FS /
    local mode)."""
    from pyspark import SparkFiles

    local = SparkFiles.get(os.path.basename(env_value))
    if os.path.exists(local):
        return local
    if os.path.exists(env_value):
        return env_value
    return None
