"""Non-parquet sources and partitioned sinks."""
