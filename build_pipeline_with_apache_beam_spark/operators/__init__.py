"""Operator library: every §2B op id from SURVEY.md, grouped by family.

Each module exposes ``QUERIES: dict[str, Callable[(SparkSession, sf_dir), DataFrame]]``
and ``ORACLE: dict[str, str]`` (DuckDB-ready ANSI SQL). Ops whose semantics are
not SQL-expressible (sketches, streaming state) appear in QUERIES only — the
driver then records a rows-only check.

Conventions (required for the driver's order-insensitive value-hash compare):
- every computed/aggregate column is aliased identically in Spark and SQL;
- double-valued aggregates are rounded to 4 decimals on BOTH sides;
- every top-k / window ordering carries a unique-key tiebreaker.
"""
