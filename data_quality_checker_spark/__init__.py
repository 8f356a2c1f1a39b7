"""data_quality_checker_spark — a from-scratch PySpark-native analytics engine.

Carries the capabilities of the reference library
(navdeep-G/data-quality-checker: DataQualityChecker, StatisticalAnalyzer,
TimeSeriesAnalyzer, NLPAnalyzer — see /root/repo/SURVEY.md) re-expressed as
pure functions over immutable ``pyspark.sql.DataFrame``s, and generalizes
them into a document-grade web-text quality pipeline (language-ID,
Gopher/C4-style heuristic rules, PII scrub, toxicity wordlist, dedup)
designed for 10^12-document scale: declarative Catalyst plans, broadcast
joins for small dims, url-hash bucketing, salting for skew, AQE on, and
Arrow-vectorized pandas UDFs as the only Python touchpoint.

Layout:
    functions/  column-expression builders (pure Catalyst, no UDFs)
    operators/  DQ checks, stats, temporal, dedup, similarity, multimodal
    plans/      the web-text quality pipeline (rules, scrub, verdict,
                synth corpus, pure-Python oracle, pipeline + metrics/lineage)
    sources/    IO: parquet/Iceberg readers & bucketed writers
    streaming/  Structured Streaming wrapper reusing the same rule exprs
"""

from data_quality_checker_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
