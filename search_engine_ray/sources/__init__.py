"""Dataset sources: parquet readers and deterministic synthetic pages."""
