"""Corpus-level NLP analysis — the NLPAnalyzer surface
(/root/reference/dataset_quality_checker/nlp_analyzer.py) rebuilt on
explode + groupBy; TF-IDF in pure SQL (no n^2 similarity matrix is
ever materialized, unlike nlp_analyzer.py:745-777)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_quality_checker_spark.tuning import adaptive_coalesce
from data_quality_checker_spark.functions.text import (
    lines,
    tokens,
    word_ngrams,
)

__all__ = [
    "top_ngrams",
    "word_frequencies",
    "redundant_tokens",
    "word_length_distribution",
    "sentence_length_distribution",
    "char_count_distribution",
    "corpus_lexical_diversity",
    "language_distribution",
    "category_feature_interaction",
    "tfidf_top_terms",
    "lda_topics",
    "analyze_text_similarity",
    "analyze_topics_and_keywords",
    "analyze_deep_linguistics",
    "detect_text_variability",
    "analyze_text_complexity_overview",
    "analyze_text_redundancy_structure",
    "rake_phrases",
    "rake_keywords",
    "sentiment_scores",
    "analyze_emotional_tone",
    "word2vec_doc_similarity",
    "repetition_ngram_metrics",
]


def _tok(df: DataFrame, text_col: str) -> DataFrame:
    from data_quality_checker_spark.tuning import parallel_input

    # scan-parallelism floor (tuning module): tokenize+explode runs on
    # every core even when the input is one parquet row group
    return parallel_input(
        df.filter(F.col(text_col).isNotNull())
    ).select(F.explode(tokens(text_col)).alias("token"))


def top_ngrams(
    df: DataFrame, text_col: str = "text", n: int = 2, top_k: int = 20
) -> DataFrame:
    """Top-k n-grams corpus-wide (nlp_analyzer.py:175-196). limit after
    orderBy compiles to TakeOrderedAndProject — no global sort.

    Tokens are materialized in their own projection: word_ngrams slices
    the token array once per n-gram index, and inlining the tokenize
    expression there re-tokenizes per index (O(words^2))."""
    from data_quality_checker_spark.tuning import parallel_input

    return (
        # scan-parallelism floor (tuning module): the tokenize+ngram
        # explode — the heaviest map in this operator — otherwise runs
        # in one task on a single-row-group parquet input (round-7)
        parallel_input(df.filter(F.col(text_col).isNotNull()))
        .select(tokens(text_col).alias("_tk"))
        .select(F.explode(word_ngrams(F.col("_tk"), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        # reduce width derived from input size (tuning module):
        # identity at scale, core-count tasks locally
        .transform(lambda d: adaptive_coalesce(d, df))
        .orderBy(F.desc("n"), "ngram")
        .limit(top_k)
    )


def word_frequencies(
    df: DataFrame, text_col: str = "text", top_k: int = 20
) -> DataFrame:
    """Top-k token frequencies (nlp_analyzer.py:374-379)."""
    return (
        _tok(df, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .transform(lambda d: adaptive_coalesce(d, df))
        .orderBy(F.desc("n"), "token")
        .limit(top_k)
    )


def redundant_tokens(
    df: DataFrame, text_col: str = "text", min_count: int = 100
) -> DataFrame:
    """Tokens appearing >= min_count times (nlp_analyzer.py:198-215)."""
    return (
        _tok(df, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .transform(lambda d: adaptive_coalesce(d, df))
    )


def word_length_distribution(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word_length, n) histogram (nlp_analyzer.py:99-122)."""
    return (
        _tok(df, text_col)
        .groupBy(F.length("token").alias("word_length"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sentence_length_distribution(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Histogram of words-per-sentence (nlp_analyzer.py:124-149);
    sentences split on [.!?]+ runs."""
    sent = F.filter(
        F.split(F.col(text_col), r"[.!?]+"),
        lambda s: F.trim(s) != F.lit(""),
    )
    from data_quality_checker_spark.tuning import parallel_input

    return (
        parallel_input(df.filter(F.col(text_col).isNotNull()))
        .select(F.explode(sent).alias("s"))
        .select(
            F.size(
                F.filter(F.split(F.trim("s"), r"\s+"), lambda t: t != F.lit(""))
            ).alias("sentence_words")
        )
        .groupBy("sentence_words")
        .agg(F.count(F.lit(1)).alias("n"))
        .transform(lambda d: adaptive_coalesce(d, df))
    )


def char_count_distribution(
    df: DataFrame, text_col: str = "text", bucket: int = 100
) -> DataFrame:
    """(char_bucket, n): document length histogram in `bucket`-char bins
    (nlp_analyzer.py:151-173)."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(
            (F.floor(F.length(text_col) / bucket) * bucket).alias(
                "char_bucket"
            )
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def corpus_lexical_diversity(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level unique/total token ratio (nlp_analyzer.py:852-885
    'overall' mode) — one aggregate, approx_count_distinct at the
    100 TB tier."""
    t = _tok(df, text_col)
    return t.agg(
        F.countDistinct("token").alias("unique_tokens"),
        F.count(F.lit(1)).alias("total_tokens"),
        (F.countDistinct("token") / F.count(F.lit(1))).alias(
            "lexical_diversity"
        ),
    )


def language_distribution(df: DataFrame, lang_col: str = "lang") -> DataFrame:
    """groupBy(lang).count() (nlp_analyzer.py:497)."""
    return (
        df.groupBy(F.col(lang_col).alias("lang"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "lang")
    )


def category_feature_interaction(
    df: DataFrame, cat_col: str, num_col: str
) -> DataFrame:
    """Per-category describe() (nlp_analyzer.py:90-97)."""
    return df.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(num_col).alias("n"),
        F.avg(num_col).alias("mean"),
        F.stddev_samp(num_col).alias("stddev"),
        F.min(num_col).alias("min"),
        F.expr(f"percentile({num_col}, 0.5)").alias("median"),
        F.max(num_col).alias("max"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document, pure SQL (replaces the sklearn
    TfidfVectorizer path, nlp_analyzer.py:745-777): tf from
    explode+groupBy, df from distinct explode, idf = ln((N+1)/(df+1))+1
    (smoothed, sklearn-style). Returns (doc, term, tfidf, rank)."""
    # N as a broadcast scalar subquery instead of a driver .count():
    # the corpus-size aggregate rides the SAME job as the scoring plan
    # (one blocking driver round-trip fewer, round-7); the value and
    # the resulting idf doubles are identical to the literal form
    # the distinct (and docfreq below) get adaptive_coalesce so their
    # post-shuffle stages run at the size-derived width instead of the
    # session's full shuffle-partition constant (sessions that pin a
    # fixed task count with AQE coalescing off would otherwise run
    # 256 near-empty tasks per stage — round-7, same rule as tf)
    nd = (
        adaptive_coalesce(
            df.filter(F.col(text_col).isNotNull())
            .select(id_col)
            .distinct(),
            df,
        )
        .agg(F.count(F.lit(1)).alias("_n"))  # NULL id counts, as before
    )
    from data_quality_checker_spark.tuning import parallel_input

    tok = parallel_input(df.filter(F.col(text_col).isNotNull())).select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("term")
    )
    # TF rows ARE the distinct (doc, term) pairs, so document
    # frequency is an aggregate of the (persisted) TF table — the
    # corpus is tokenized once, not twice, and the explode+distinct
    # shuffle disappears (round-7; same trick as the embed IDF).
    # The cache handle rides _cached_deps (release_cache contract).
    tf = adaptive_coalesce(
        tok.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf")), df
    ).persist()
    docfreq = adaptive_coalesce(
        tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")), df
    )
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc",
            "term",
            (
                F.col("tf")
                * (
                    F.log(
                        (F.col("_n") + 1).cast("double")
                        / (F.col("df") + 1)
                    )
                    + 1
                )
            ).alias("tfidf"),
        )
    )
    from data_quality_checker_spark.tuning import scaled_partitions

    w = Window.partitionBy("doc").orderBy(F.desc("tfidf"), "term")
    # the explicit doc-repartition satisfies the window's required
    # distribution at the adaptive width — still exactly one exchange
    out = (
        scored.repartition(scaled_partitions(df), "doc")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )
    out._cached_deps = (tf,)
    return out


def lda_topics(
    df: DataFrame,
    text_col: str = "text",
    num_topics: int = 5,
    max_vocab: int = 1000,
    seed: int = 42,
    max_iter: int = 10,
):
    """Corpus-level LDA topics via Spark ML (nlp_analyzer.py:56-85
    used sklearn). Returns (topic, termIndices, termWeights) DataFrame
    plus the vocabulary list."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer

    toks = df.filter(F.col(text_col).isNotNull()).select(
        tokens(text_col).alias("toks")
    )
    cv = CountVectorizer(
        inputCol="toks", outputCol="features", vocabSize=max_vocab
    ).fit(toks)
    vec = cv.transform(toks)
    lda = LDA(k=num_topics, seed=seed, maxIter=max_iter).fit(vec)
    return lda.describeTopics(), list(cv.vocabulary)


# ---------------------------------------------------------------------
# composite analyzers — the reference's one-call wrappers
# (nlp_analyzer.py:383-646). Each returns a dict of lazy DataFrames so
# a reference user has a drop-in equivalent; constituents are the
# operators above (scoped-out branches — word2vec, RAKE, NER/POS — are
# documented in SURVEY.md §2.9 and omitted here too).
# ---------------------------------------------------------------------


def analyze_text_similarity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    similarity_threshold: float = 0.8,
    top_k_terms: int = 3,
) -> dict:
    """nlp_analyzer.py:383-419: similar pairs + vectorization. The n^2
    SequenceMatcher pair scan becomes MinHash-LSH; the TF-IDF matrix
    becomes per-doc top terms (never a dense n x vocab frame)."""
    from data_quality_checker_spark.operators.dedup import (
        near_duplicates_minhash,
    )

    return {
        "similar_text_pairs": near_duplicates_minhash(
            df, id_col, text_col, threshold=similarity_threshold
        ),
        "tfidf_top_terms": tfidf_top_terms(
            df, id_col, text_col, top_k=top_k_terms
        ),
    }


def analyze_topics_and_keywords(
    df: DataFrame,
    text_col: str = "text",
    n_topics: int = 5,
    top_keywords: int = 10,
    ngram_n: int = 2,
    top_ngrams_k: int = 20,
) -> dict:
    """nlp_analyzer.py:421-459: LDA topics + keywords (word-frequency
    branch; RAKE scoped out) + top n-grams."""
    topics, vocab = lda_topics(df, text_col, num_topics=n_topics)
    return {
        "topics": topics,
        "vocabulary": vocab,
        "keywords": word_frequencies(df, text_col, top_k=top_keywords),
        "ngrams": top_ngrams(df, text_col, n=ngram_n, top_k=top_ngrams_k),
    }


def analyze_deep_linguistics(
    df: DataFrame, text_col: str = "text"
) -> dict:
    """nlp_analyzer.py:461-499: language mix + lexical richness
    (NER/POS branches scoped out — spaCy/nltk absent by design)."""
    from data_quality_checker_spark.functions.text import langid_best

    langs = (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(langid_best(text_col).alias("lang"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return {
        "language_distribution": langs,
        "lexical_diversity": corpus_lexical_diversity(df, text_col),
        "word_length_distribution": word_length_distribution(df, text_col),
    }


def detect_text_variability(
    df: DataFrame, text_col: str = "text", min_count: int = 3
) -> dict:
    """nlp_analyzer.py:501-540: repetition/variability signals (entity
    variations reframed as casing-collision + overused tokens)."""
    from data_quality_checker_spark.operators.quality import (
        inconsistent_casing,
    )

    return {
        "lexical_diversity": corpus_lexical_diversity(df, text_col),
        "overused_tokens": redundant_tokens(df, text_col, min_count),
        "casing_variants": inconsistent_casing(df, text_col),
    }


def analyze_text_complexity_overview(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """nlp_analyzer.py:542-574: per-document complexity metrics in ONE
    projection (chars, words, mean word length, lexical diversity,
    mean sentence words; textstat readability lives in
    plans/udfs.perplexity_udf — model-backed, kept separate)."""
    from data_quality_checker_spark.functions import text as X

    sent = F.filter(
        F.split(F.col(text_col), r"[.!?]+"),
        lambda s: F.trim(s) != F.lit(""),
    )
    n_sent = F.size(sent)
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        X.char_count(text_col).alias("chars"),
        X.word_count(text_col).alias("words"),
        X.mean_word_length(text_col).alias("mean_word_len"),
        X.lexical_diversity(text_col).alias("lexical_diversity"),
        F.when(
            n_sent > 0,
            X.word_count(text_col).cast("double") / n_sent,
        ).alias("mean_sentence_words"),
    )


def analyze_text_redundancy_structure(
    df: DataFrame,
    text_col: str = "text",
    redundancy_threshold: int = 3,
    ngram_n: int = 3,
    top_ngrams_k: int = 20,
) -> dict:
    """nlp_analyzer.py:611-646: overused phrases + sentence structure +
    common n-grams."""
    return {
        "redundant_phrases": redundant_tokens(
            df, text_col, min_count=redundancy_threshold
        ),
        "sentence_structure": sentence_length_distribution(df, text_col),
        "common_ngrams": top_ngrams(
            df, text_col, n=ngram_n, top_k=top_ngrams_k
        ),
    }


def rake_phrases(
    df: DataFrame,
    text_col: str = "text",
    stopwords: tuple[str, ...] | None = None,
) -> DataFrame:
    """Candidate keyword phrases per RAKE (Rose et al. 2010): maximal
    runs of tokens between stopwords/punctuation. One row per phrase
    INSTANCE (duplicates kept — word statistics count occurrences).

    Construction is deliberately list-based (punctuation -> a break
    marker, stopword tokens -> the marker, join, split on the marker)
    rather than a lookahead alternation regex, so the DuckDB oracle
    twin (RE2: no lookahead) can reproduce it token-for-token."""
    from data_quality_checker_spark.functions.text import tokens
    from data_quality_checker_spark.functions.wordlists import STOPWORDS

    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS["en"])])
    s = F.regexp_replace(
        F.lower(F.col(text_col)), r"[^\p{L}\p{N}\s]+", " ¦ "
    )
    marked = F.transform(
        tokens(s, lowercase=False),
        lambda t: F.when(
            F.array_contains(sw, t) | (t == F.lit("¦")),
            F.lit("¦"),
        ).otherwise(t),
    )
    phrase = F.filter(
        F.transform(
            F.split(F.array_join(marked, " "), "¦"),
            lambda p: F.trim(F.regexp_replace(p, r"\s+", " ")),
        ),
        lambda p: p != F.lit(""),
    )
    from data_quality_checker_spark.tuning import parallel_input

    return (
        parallel_input(df.filter(F.col(text_col).isNotNull()))
        .select(F.explode(phrase).alias("phrase"))
    )


def rake_keywords(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
    stopwords: tuple[str, ...] | None = None,
    score_round: int | None = None,
) -> DataFrame:
    """RAKE keyword extraction (nlp_analyzer.py:351-381 'rake' branch,
    which calls rake_nltk — reimplemented here as three aggregates, no
    library): word score = degree/frequency over all phrase instances
    (degree = sum of containing-phrase lengths), phrase score = sum of
    member word scores, deduplicated phrases ranked by score. Fully
    distributed: explode phrases -> explode words -> one groupBy for
    word stats -> broadcast-join scores back -> phrase aggregate ->
    top-k."""
    ph = rake_phrases(df, text_col, stopwords)
    # word statistics over ALL phrase instances
    pw = ph.select(
        "phrase",
        F.size(F.split(F.col("phrase"), " ")).alias("_plen"),
        F.explode(F.split(F.col("phrase"), " ")).alias("w"),
    )
    wstats = pw.groupBy("w").agg(
        (F.sum("_plen").cast("double") / F.count(F.lit(1))).alias(
            "_wscore"
        )  # degree / frequency
    )
    # score each DISTINCT phrase once, over its word multiset
    dp = ph.distinct().select(
        "phrase", F.explode(F.split(F.col("phrase"), " ")).alias("w")
    )
    scored = (
        dp.join(F.broadcast(wstats), "w")
        .groupBy("phrase")
        .agg(F.sum("_wscore").alias("score"))
    )
    # score_round: rank on the ROUNDED score so cross-engine last-ulp
    # float differences can't flip tie-adjacent ranks (oracle queries
    # pass 6; interactive use keeps full precision)
    if score_round is not None:
        scored = scored.withColumn(
            "score", F.round(F.col("score"), score_round)
        )
    # top-k FIRST (orderBy+limit compiles to TakeOrderedAndProject —
    # no single-task global sort of every distinct phrase), then rank
    # the tiny k-row result with the window
    top = scored.orderBy(F.col("score").desc(), "phrase").limit(top_k)
    w = Window.orderBy(F.col("score").desc(), F.col("phrase"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "phrase", "score", "rank"
    )


def sentiment_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Wordlist sentiment (the dependency-free reframing of the
    reference's TextBlob _sentiment_analysis / analyze_emotional_tone,
    nlp_analyzer.py:931-952, :686-718 — same move as the toxicity
    rule): per-doc positive/negative hit counts via the codegen'd
    alternation scan, polarity = (pos - neg) / (pos + neg) in [-1, 1]
    (NULL when no polar word occurs), verdict column per the
    reference's pos/neg/neutral buckets.

    Round 3 adds the SUBJECTIVITY axis (nlp_analyzer.py:954-967 and
    the subjectivity leg of analyze_emotional_tone, :686-718):
    subj_hits counts opinion/hedge markers (SUBJECTIVE_WORDS), and
    subjectivity = min(1, (pos + neg + subj hits) / tokens) in [0, 1]
    — polar words are inherently subjective, so both families count;
    NULL for token-less docs."""
    from data_quality_checker_spark.functions.text import tokens
    from data_quality_checker_spark.functions.wordlists import (
        NEGATIVE_WORDS,
        POSITIVE_WORDS,
        SUBJECTIVE_WORDS,
    )
    from data_quality_checker_spark.plans.rules import word_alt_pattern

    lower = F.lower(F.col(text_col))
    pos = F.regexp_count(lower, F.lit(word_alt_pattern(POSITIVE_WORDS)))
    neg = F.regexp_count(lower, F.lit(word_alt_pattern(NEGATIVE_WORDS)))
    subj = F.regexp_count(lower, F.lit(word_alt_pattern(SUBJECTIVE_WORDS)))
    d = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        pos.alias("pos_hits"),
        neg.alias("neg_hits"),
        subj.alias("subj_hits"),
        F.size(tokens(text_col)).alias("_n_tok"),
    )
    total = F.col("pos_hits") + F.col("neg_hits")
    polarity = F.when(
        total > 0,
        (F.col("pos_hits") - F.col("neg_hits")).cast("double") / total,
    )
    subjectivity = F.when(
        F.col("_n_tok") > 0,
        F.least(
            F.lit(1.0),
            (total + F.col("subj_hits")).cast("double") / F.col("_n_tok"),
        ),
    )
    return d.select(
        id_col,
        "pos_hits",
        "neg_hits",
        "subj_hits",
        polarity.alias("polarity"),
        F.when(polarity > 0.2, F.lit("positive"))
        .when(polarity < -0.2, F.lit("negative"))
        .when(polarity.isNotNull(), F.lit("neutral"))
        .alias("tone"),
        subjectivity.alias("subjectivity"),
        F.when(subjectivity > 0.05, F.lit("subjective"))
        .when(subjectivity.isNotNull(), F.lit("objective"))
        .alias("subjectivity_label"),
    )


def analyze_emotional_tone(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Composite emotional-tone profile (analyze_emotional_tone,
    nlp_analyzer.py:686-718): the reference averages TextBlob polarity
    + subjectivity per document and buckets the tone; here both axes
    come from :func:`sentiment_scores`' single wordlist projection —
    one scan, no UDF. Completes the TextBlob family
    (_sentiment_analysis + _subjectivity_analysis)."""
    return sentiment_scores(df, id_col, text_col).select(
        id_col, "polarity", "tone", "subjectivity", "subjectivity_label"
    )


def word2vec_doc_similarity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vector_size: int = 32,
    min_count: int = 2,
    top_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """_compute_text_similarity's word2vec leg (nlp_analyzer.py:779-817
    — the reference loads a pre-trained gensim Word2Vec and loops
    pairwise similarities):
    Spark ML Word2Vec trained on the tokenized corpus (distributed
    skip-gram), document vector = mean of word vectors (the
    transform's own semantics), then top-k cosine neighbors per doc
    via the broadcast brute-force ranking. numPartitions=1 + fixed
    seed keep training deterministic per corpus in local mode; at
    crawl scale swap the brute-force ranking for similarity.topk_lsh /
    topk_ivf over the same vectors. Returns
    (query_id, id, cosine, rank)."""
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    from data_quality_checker_spark.operators.similarity import (
        topk_bruteforce,
    )

    tok_df = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"), tokens(text_col).alias("words")
    )
    w2v = Word2Vec(
        vectorSize=vector_size,
        minCount=min_count,
        seed=seed,
        numPartitions=1,
        inputCol="words",
        outputCol="_vec",
    )
    model = w2v.fit(tok_df)
    emb = model.transform(tok_df).select(
        "vec_id", vector_to_array("_vec").alias("embedding")
    )
    return topk_bruteforce(emb, emb, k=top_k)


def repetition_ngram_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (2, 3, 4),
) -> DataFrame:
    """Gopher-style per-document repetition metrics: for each n in
    ``ns``, the document's most frequent word n-gram and the fraction
    of its tokens covered by that n-gram's occurrences
    (``top_count * n / n_tokens`` — the token-fraction variant of
    Gopher's character-fraction rule; no reference ancestor,
    training-data extension).

    One row per (doc, n): ``(id_col, n, top_ngram, top_count,
    token_frac)``. Ties break to the lexicographically largest n-gram
    (deterministic across engines).

    Plan: ONE scan and ONE explode — the per-n n-gram arrays are
    tagged with their n and flattened into a single array<struct>
    before exploding (a union of per-n legs would scan and
    re-tokenize the corpus once per n) — then two hash aggregates:
    (doc, n, ngram) counts with map-side combine, then max(struct)
    per (doc, n). Both shuffles carry scalar rows keyed by doc id;
    nothing is windowed, so a pathologically repetitive document
    cannot skew a sort."""
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        tokens(text_col).alias("_tk"),
    )

    def _tag(n: int):
        return lambda g: F.struct(
            F.lit(n).alias("n"), g.alias("_ng")
        )

    combined = F.flatten(
        F.array(
            *[
                F.transform(word_ngrams(F.col("_tk"), n), _tag(n))
                for n in ns
            ]
        )
    )
    uni = base.select(
        id_col,
        F.size("_tk").alias("_ntok"),
        F.explode(combined).alias("_c"),
    ).select(
        id_col,
        F.col("_c.n").alias("n"),
        "_ntok",
        F.col("_c._ng").alias("_ng"),
    )
    counts = uni.groupBy(id_col, "n", "_ng").agg(
        F.count(F.lit(1)).alias("_c"), F.max("_ntok").alias("_ntok")
    )
    top = (
        counts.groupBy(id_col, "n")
        .agg(
            F.max(F.struct(F.col("_c"), F.col("_ng"))).alias("_t"),
            F.max("_ntok").alias("_ntok"),
        )
        .select(
            id_col,
            "n",
            F.col("_t._ng").alias("top_ngram"),
            F.col("_t._c").alias("top_count"),
            # least(1): occurrences of a self-overlapping n-gram
            # ('a a a a a', n=2 -> 4 overlapping hits of 5 tokens)
            # double-count tokens; the clamp keeps this a fraction
            F.round(
                F.least(
                    F.lit(1.0),
                    F.col("_t._c") * F.col("n") / F.col("_ntok"),
                ),
                6,
            ).alias("token_frac"),
        )
    )
    return top
