"""Sources & sinks: parquet locally, Iceberg in production (gated)."""
