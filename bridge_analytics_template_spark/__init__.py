"""bridge_analytics_template_spark — a PySpark-native analytics engine.

A from-scratch, idiomatic-Spark re-expression of the query and
data-processing surface of Sage-Bionetworks/bridge-analytics-template
(reference at /root/reference, read-only), extended with the operators a
large-scale (100 TB) LLM training-data pipeline needs: deduplication,
similarity search, multimodal columns, and text analysis.

Design principles (see SURVEY.md):
  * DataFrame/SQL only — declare logical plans, let Catalyst/Tungsten pick
    physical strategy. No RDDs.
  * Built-in ``pyspark.sql.functions`` in the hot path; Arrow-batched
    Pandas UDFs only where Python semantics are genuinely required.
  * Every operator designed for multi-executor scale: broadcast small dims,
    partial aggregation, partition-layout-aware sinks, AQE-friendly plans.
"""

__version__ = "0.1.0"
