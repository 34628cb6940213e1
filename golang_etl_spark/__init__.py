"""golang_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``ayyoubmaul/golang-etl`` (a sharded MySQL -> Parquet bulk extractor,
see SURVEY.md) as an idiomatic Spark engine:

- ``etl``       : the reference's extract pipeline (bounds discovery ->
                  partitioned range scan -> batched snappy parquet sink),
                  re-expressed as declarative DataFrame reads/writes.
- ``jobspec``   : YAML job spec + schema loader (parity with
                  ``/root/reference/schema/read_schema.go``).
- ``operators`` : the full relational surface (joins, aggregation,
                  windows, set ops, sort/limit/top-k) plus LLM-data-
                  pipeline operators (dedup, similarity search, text
                  analysis, multimodal columns).
- ``streaming`` : Structured Streaming jobs over the events table.
- ``registry``  : query registry feeding the driver contract
                  (``__spark_entry__.queries()`` / ``oracle_sql()``).

Everything is DataFrame/SQL-first: Catalyst plans, broadcast hints for
small dimensions, pushed-down filters, no driver-side loops. Designed
for a 1000-executor / 100 TB deployment even though CI runs local[32].
"""

__version__ = "0.1.0"
