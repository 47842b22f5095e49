"""scicat_ingestor_spark — a PySpark-native analytics/ETL engine with the
query and data-processing capabilities of SciCatProject/scicat-ingestor.

Brand-new Spark-first design (DataFrame/SQL + Structured Streaming), not a
port: the reference's per-message interpreter becomes a compiled logical
plan (`plans.compiler`), its closed scalar-operator registry becomes Column
expression builders (`functions.scalar`), its REST lookups become broadcast
dimension joins (`operators.joins`), and its Kafka poll loop becomes a
`readStream -> foreachBatch` shell (`streaming.pipeline`).

Reference inventory: see SURVEY.md §2 at the repo root; each module
docstring cites the reference file:line it mirrors.
"""

__version__ = "0.1.0"
