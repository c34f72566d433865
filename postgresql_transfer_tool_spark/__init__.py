"""postgresql_transfer_tool_spark — a PySpark-native analytics/ETL engine.

A ground-up, Spark-first re-expression of the capabilities of the
reference tool ``oyekamal/postgresql-transfer-tool`` (a PostgreSQL→PostgreSQL
bulk migration / ETL orchestrator), extended with the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
required for 100 TB-scale training-data processing.

Design principles (see SURVEY.md §1.5, §4, §7):

- **DataFrame/SQL only.** Every operator is declared through the DataFrame
  API or Spark SQL so Catalyst handles pushdown, pruning, join selection,
  AQE and codegen. No RDDs.
- **Shuffle-aware.** Small dimensions are broadcast; large joins rely on
  AQE + explicit repartitioning; skew-prone self-joins (shingle joins in
  near-dup detection) cap document frequency to bound the hot keys.
- **JVM-side expressions.** The hot path uses built-in
  ``pyspark.sql.functions``; Python appears only in Arrow-batched
  ``mapInPandas`` for genuinely non-relational work (multimodal decode).
- **Exact-arithmetic aggregates.** Oracle-checked queries aggregate through
  DECIMAL (order-independent, engine-independent) and cast the final
  result to DOUBLE, making results bit-stable across engines and runs.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .catalog import TABLES, load_table, register_views  # noqa: F401
