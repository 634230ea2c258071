"""ecom_churn_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference lakehouse (schauh08/ecom-churn-lakehouse): medallion-style
ingest → normalize/dedup → DQ gate → point-in-time feature snapshots →
churn labels → training snapshots, generalized into a library of
composable, contract-driven operators, plus the large-scale
training-data-pipeline surface (dedup, similarity search, text
analysis, multimodal plumbing) the reference lacks.

Design rules (see SURVEY.md §2.10, §7):
- DataFrame API everywhere; no RDDs in the data plane.
- Native ``pyspark.sql.functions`` expressions over UDFs; Pandas UDFs
  only where semantics genuinely require Python (multimodal decode).
- No driver-side collects in the data plane; metadata-plane collects
  (scalar bounds, version assertions) are explicit and bounded.
- Every operator is designed for a 1000-executor / 100 TB deployment:
  broadcast small dims, pre-aggregate before joins, push filters to
  the scan, avoid shuffles that don't pay for themselves.
"""

__version__ = "0.1.0"
