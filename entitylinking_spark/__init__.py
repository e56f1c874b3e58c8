"""entitylinking_spark — a from-scratch PySpark-native entity-resolution engine.

Re-expresses the capabilities of the reference repo
(phuvinhnguyen/EntityLinking, snapshot at /root/reference) as an idiomatic
Spark DataFrame pipeline:

    blocking (lang + path tokens + MinHash/LSH bands)
      -> salted candidate-pair self-join (skew-split hot blocks)
      -> Arrow-batched pairwise string similarity
      -> threshold -> iterative large-star/small-star connected components
      -> transitive entity clusters

The reference's capability map (see SURVEY.md for file:line citations):
  * candidate generation via blocking indexes  (Sparkle/database.py:165-197)
  * pairwise scoring                           (OneNet/data_process.py:158-170)
  * rank aggregation                           (Sparkle/algorithms.py:17-265)
  * graph propagation / transitive closure     (e2e/systems/graph_system.py:953-1006)
  * micro/macro P/R/F1 evaluation              (e2e/evaluation.py:537-566)

Everything here is DataFrame-only; Python appears solely inside Arrow-batched
pandas UDFs (never per-row Spark UDFs).
"""

__version__ = "0.1.0"
