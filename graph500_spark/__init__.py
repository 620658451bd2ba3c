"""graph500_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the suzumura/graph500 reference
(Graph500 BFS benchmark pipeline: deterministic Kronecker generation,
distributed graph construction, level-synchronous BFS, spec validation,
run statistics), re-expressed as idiomatic Spark DataFrame operators,
plus large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal column plumbing).

Design stance (see SURVEY.md):
  * Everything is declarative DataFrame/SQL so Catalyst picks physical
    plans (broadcast vs shuffle joins, AQE skew handling, partial aggs).
  * The only imperative kernels are the bit-exact Graph500 PRNG /
    scramble (NumPy, Arrow-batched) — everything else is Column algebra.
  * Operators are generic over any ``DataFrame[src: long, dst: long]``
    edge table so they run unchanged on testdata-derived edges and on
    generated Kronecker graphs at any scale.
"""

__version__ = "0.1.0"
