"""opengauss_vectordb_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of liu-peng-xi/openGauss-VectorDB.

Not a port: the reference (openGauss RDBMS + the `datavec` pgvector-derived
extension, see SURVEY.md) defines WHAT is computed; execution here is
idiomatic Spark — DataFrame / Spark SQL / Catalyst / MLlib — designed for
100 TB-scale datasets on a real cluster while testable on local[N].

Layout:
  session.py    SparkSession bootstrap tuned for the engine
  catalog.py    table catalog over the parquet star schema
  functions/    PG-name scalar/aggregate function layer (reference §2.7)
  operators/    relational operator surface + LLM-pipeline ops (dedup, text)
  vector/       vector type helpers, distances, exact kNN, IVF ANN
  sources/      readers/writers beyond parquet (csv, jdbc, fixed-width)
  plans/        plan inspection / ANN query-shape rewrite helpers
  streaming/    additive Structured Streaming over the events table
"""

__version__ = "0.1.0"
