"""Distributed spelling suggestion — the Spark-first reframing of the
reference's correct_spelling (nlp_analyzer.py:39-54, TextBlob
``.correct()``),
which mutates text row-by-row through a Python library. Mutation breaks
this engine's byte-identity invariant (scrubbed text must be
reproducible byte-for-byte), so the operator is NON-destructive: it
returns a (token -> suggestion) mapping that callers may apply, audit,
or ignore.

The algorithm is SymSpell's delete-neighborhood trick (public domain,
Garbe 2012) expressed as DataFrame joins:

  two words share a member of their {word + all single-character
  deletions} sets iff one is reachable from the other by one
  insert/delete/substitute OR an adjacent transposition (plus a thin
  tail of other Levenshtein-2 pairs) — i.e. the shared key bounds
  plain Levenshtein at 2 and covers exactly the Damerau-1 typo family,

so candidate generation is an EQUI-JOIN on the delete key — never a
cross join, never a per-row dictionary lookup UDF. Candidates are
filtered to ``F.levenshtein <= 2`` (JVM, codegen; the provable bound
for a shared key) and the suggestion ranks by (levenshtein ASC,
vocabulary frequency DESC, word) — a distance-1 neighbor always beats
a transposition, which beats nothing. Both sides of the join are
vocabulary-sized (distinct tokens), not corpus-sized; the explode
factor is the token length, capped by ``max_token_len``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_quality_checker_spark.functions.text import tokens

__all__ = [
    "token_frequencies",
    "spelling_suggestions",
    "with_corrected_text",
]


def token_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, freq) over the corpus — one explode + groupBy
    (map-side combined). The scan floor keeps the tokenize map
    parallel on single-row-group inputs (round-7; identity on
    already-split production scans)."""
    from data_quality_checker_spark.tuning import parallel_input

    return (
        parallel_input(df.filter(F.col(text_col).isNotNull()))
        .select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _deletes(col, max_token_len: int):
    """token + every single-character deletion of it, as an array
    column (pure Catalyst: substring arithmetic over a 1..len
    sequence)."""
    t = col
    dels = F.transform(
        F.sequence(F.lit(1), F.least(F.length(t), F.lit(max_token_len))),
        lambda i: F.concat(
            F.substring(t, F.lit(1), (i - 1).cast("int")),
            t.substr(i + 1, F.lit(max_token_len)),
        ),
    )
    return F.array_union(F.array(t), dels)


def spelling_suggestions(
    df: DataFrame,
    text_col: str = "text",
    vocab: DataFrame | None = None,
    min_freq: int = 5,
    max_token_len: int = 20,
) -> DataFrame:
    """(token, freq, suggestion, suggestion_freq) for every corpus
    token NOT in the vocabulary that has a vocabulary word within edit
    distance 1.

    ``vocab``: optional (token, freq) DataFrame of known-good words;
    when None it is derived from the corpus itself — tokens with
    freq >= ``min_freq`` (misspellings are rare by definition; the
    same self-corpus heuristic SymSpell deployments use when no
    dictionary ships). Tokens longer than ``max_token_len`` are left
    alone (URLs, hashes, identifiers — correcting those is noise).

    Scan economy: ``freqs`` feeds three consumers (vocab filter,
    suspect anti-join, both delete-key sides), so the self-corpus path
    persist()s the vocabulary-sized frequency table — the corpus is
    tokenized ONCE, not three times (plan-pinned in tests). Call
    ``operators.dedup.release_cache`` on the result when done (same
    contract as the MinHash operators).
    """
    from data_quality_checker_spark.tuning import (
        adaptive_coalesce,
        scaled_partitions,
    )

    # reduce widths derived from the corpus size (tuning module):
    # identity at scale, core-count reduce stages locally
    freqs = adaptive_coalesce(token_frequencies(df, text_col), df)
    cached: tuple = ()
    if vocab is None:
        freqs = freqs.persist()
        cached = (freqs,)
        vocab = freqs.filter(F.col("freq") >= min_freq)
    vocab = vocab.select(
        F.col("token").alias("vword"), F.col("freq").alias("vfreq")
    ).filter(F.length("vword") <= max_token_len)

    suspects = (
        freqs.join(
            vocab.select(F.col("vword").alias("token")), "token", "anti"
        )
        .filter(F.length("token") <= max_token_len)
        .filter(F.length("token") >= 3)  # 1-2 char tokens: no signal
    )

    s_keys = suspects.select(
        "token",
        "freq",
        F.explode(_deletes(F.col("token"), max_token_len)).alias("dk"),
    )
    v_keys = vocab.select(
        "vword",
        "vfreq",
        F.explode(_deletes(F.col("vword"), max_token_len)).alias("dk"),
    )
    cands = (
        adaptive_coalesce(
            s_keys.join(v_keys, "dk")
            .drop("dk")
            .distinct(),  # same pair can meet on several delete keys
            df,
        )
        .withColumn("distance", F.levenshtein("token", "vword"))
        .filter(F.col("distance") <= 2)
    )
    w = Window.partitionBy("token").orderBy(
        "distance", F.col("vfreq").desc(), F.col("vword")
    )
    out = (
        cands.repartition(scaled_partitions(df), "token")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "token",
            "freq",
            F.col("vword").alias("suggestion"),
            F.col("vfreq").alias("suggestion_freq"),
            "distance",
        )
    )
    out._cached_deps = cached  # for operators.dedup.release_cache
    return out


def with_corrected_text(
    df: DataFrame,
    suggestions: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "text_corrected",
    broadcast: bool = True,
    strategy: str = "auto",
    max_map_entries: int = 10_000,
) -> DataFrame:
    """Opt-in APPLICATION of a suggestion table: adds ``out_col`` —
    the document's tokens rejoined with every suggested token replaced
    — while leaving ``text_col`` byte-for-byte untouched (completing
    the reference's correct_spelling output contract,
    nlp_analyzer.py:39-54, without breaking the scrub byte-identity
    invariant).

    Contract: ``out_col`` is the WHITESPACE-NORMALIZED lowercase
    reassembly (single spaces, the ``tokens()`` view of the text) —
    a derived column for training-data use, not an in-place edit;
    documents with no tokens (NULL / blank text) get NULL.

    Idempotent by construction: suggestion keys are non-vocabulary
    tokens, replacements are vocabulary words, so a second application
    over the same suggestions is the identity.

    Two strategies, identical output (parity-pinned in tests):

    - ``'map'`` — the suggestion table (typo TYPES, not corpus
      tokens: bounded by the vocabulary's misspelling count, normally
      thousands) collects to a driver map literal and the correction
      becomes ONE projection — ``transform(tokens, t ->
      coalesce(map[t], t))`` — ZERO shuffle, zero join, the corpus
      never moves. This is the 100 TB path.
    - ``'join'`` — posexplode -> equi-join tokens against the
      suggestion table (broadcast by default; ``broadcast=False``
      lets AQE size it) -> one narrow regroup keyed by ``id_col``.
      For suggestion sets too large to hold driver-side.
    - ``'auto'`` (default) — row-count guard: 'map' when the table
      holds at most ``max_map_entries`` rows, else 'join' (same
      measure-then-choose discipline as contamination_report). The
      default is 10k because the map literal materializes as
      2x``max_map_entries`` Literal nodes in the analyzed plan — past
      ~20k nodes, planning/codegen pressure outweighs the saved join
      (raise it deliberately if your driver is sized for it).

    Precondition: ``id_col`` is unique (same contract as
    contamination_report)."""
    if strategy not in ("auto", "map", "join"):
        raise ValueError(f"unknown strategy: {strategy!r}")
    deps = getattr(suggestions, "_cached_deps", ())
    rows = None
    if strategy == "auto":
        # ONE bounded collect decides the strategy AND feeds the map —
        # a separate count() would execute the whole suggestion plan
        # (explode + delete-key join + window) twice
        rows = (
            suggestions.select("token", "suggestion")
            .limit(max_map_entries + 1)
            .collect()
        )
        strategy = "map" if len(rows) <= max_map_entries else "join"
    toks = tokens(text_col)
    if strategy == "map":
        if rows is None:
            rows = suggestions.select("token", "suggestion").collect()
        pairs = {r["token"]: r["suggestion"] for r in rows}
        if pairs:
            ks, vs = zip(*sorted(pairs.items()))
            # one parsed map literal, not 2 x entries py4j calls
            # (10k entries would otherwise bill ~seconds of driver-
            # side build time per invocation — functions/litfast)
            from data_quality_checker_spark.functions.litfast import (
                lit_str_map,
            )

            m = lit_str_map(ks, vs)
            # try_element_at, not element_at: ANSI mode makes a missing
            # map key THROW, and almost every token is a missing key
            fixed = F.transform(
                toks, lambda t: F.coalesce(F.try_element_at(m, t), t)
            )
        else:
            fixed = toks
        corrected = F.when(
            F.col(text_col).isNotNull() & (F.size(toks) > 0),
            F.concat_ws(" ", fixed),
        )
        out = df.withColumn(out_col, corrected)
        # propagate the suggestion builder's persisted deps so the
        # bench/oracle harnesses (which unpersist _cached_deps on the
        # RETURNED frame) can release the freqs cache
        out._cached_deps = deps
        return out
    sugg = suggestions.select(
        F.col("token").alias("_tok"), F.col("suggestion").alias("_sugg")
    )
    if broadcast:
        sugg = F.broadcast(sugg)
    pos = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(toks).alias("_pos", "_tok"),
    )
    fixed = pos.join(sugg, "_tok", "left").select(
        id_col,
        F.struct(
            F.col("_pos").alias("pos"),
            F.coalesce("_sugg", "_tok").alias("ct"),
        ).alias("_s"),
    )
    corrected = fixed.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list("_s")), lambda s: s["ct"]
            ),
        ).alias(out_col)
    )
    out = df.join(corrected, id_col, "left")
    out._cached_deps = deps
    return out
