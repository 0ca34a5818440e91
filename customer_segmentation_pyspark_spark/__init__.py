"""customer_segmentation_pyspark_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``iam-tarun/Customer-segmentation-Pyspark`` (a Databricks
notebook implementing customer segmentation with a hand-rolled MapReduce
K-means, ``/root/reference/codeText.txt``), extended with the operators a
large-scale (100 TB) LLM-training-data pipeline needs: deduplication,
similarity search, multimodal column plumbing, and text analysis.

Design principles (see SURVEY.md §7):
  * DataFrame/SQL first — declare logical plans, let Catalyst pick physical.
  * No row-at-a-time Python in the hot path; Pandas UDFs only where built-in
    expressions cannot express the semantics.
  * Every iterative loop caches its input and broadcasts its small state.
  * All randomness is seeded.
"""

from customer_segmentation_pyspark_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
