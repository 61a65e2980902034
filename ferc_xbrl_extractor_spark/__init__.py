"""PySpark-native analytics engine with the query/data-processing surface of
catalyst-cooperative/ferc-xbrl-extractor, re-architected Spark-first.

Layers (see SURVEY.md §7.0):

- ``catalog``   — driver-side schema inference: taxonomy → TableSpec, version
  merge, datapackage/metadata JSON.
- ``sources``   — filing scans (dir/zip) + the XML shredder (mapInPandas)
  producing long ``facts``/``contexts`` DataFrames.
- ``operators`` — the full operator inventory (SURVEY.md §2) as pure
  ``DataFrame -> DataFrame`` functions, including the LLM-pipeline gap
  operators (dedup, near-dup, similarity search, text analysis, windows,
  as-of joins, JSON ops, multimodal plumbing).
- ``functions`` — scalar helpers (snakecase, name cleaning, casts).
- ``plans``     — declared benchmark/correctness queries + DuckDB oracles.
- ``pipeline``  — the extract lifecycle + sinks (parquet/sqlite/duckdb/
  datapackage JSON).
- ``streaming`` — Structured Streaming variants of the event-time operators.

Everything is built on the public PySpark DataFrame API; Catalyst owns
physical planning. Design target is a multi-executor cluster at ~100 TB:
no driver-side data loops, no row-at-a-time Python in hot paths, explicit
broadcast hints for dimension joins, AQE on.
"""

__version__ = "0.1.0"
