"""Webtext / training-data operators, each with a Ray implementation and
(where SQL-expressible) a DuckDB oracle string consumed by __ray_entry__."""
