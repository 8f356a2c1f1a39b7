"""Column-expression builders: pure Catalyst, zero Python UDFs.

Everything here returns ``pyspark.sql.Column`` so rules compose into a
single projection that whole-stage codegen executes JVM-side.
"""

from data_quality_checker_spark.functions import hashing, text, wordlists

__all__ = ["text", "hashing", "wordlists"]
