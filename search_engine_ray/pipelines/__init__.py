"""End-to-end pipelines (index build, search, dataset constructors)."""
