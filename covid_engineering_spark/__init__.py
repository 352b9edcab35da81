"""covid_engineering_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capability surface of JoramvdLuit/Covid-Engineering (reference:
/root/reference/main.py, a single-process eager pandas application)
as an idiomatic, lazily-planned, Catalyst-optimized Spark DataFrame
engine, plus the large-scale training-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing,
structured streaming) that the reference lacks.

Design rules (see SURVEY.md):
  * DataFrame/SQL only — no RDDs; declare the logical plan and let
    Catalyst/Tungsten pick the physical strategy.
  * Built-in ``pyspark.sql.functions`` in every hot path; Arrow-batched
    pandas UDFs (``applyInPandas``/``mapInPandas``) only where the
    semantics are genuinely sequential (SIRD simulation) or opaque
    (multimodal decode).
  * Broadcast small dimensions, pre-aggregate before shuffles, keep
    filters/pruning pushed to the scan — verified in plans/checks.py.
"""

from covid_engineering_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
