"""merge_machine_spark — a PySpark-native entity-resolution / record-linkage engine.

A from-scratch re-design (NOT a port) of the capabilities of
entrepreneur-interet-general/Merge-Machine (reference at /root/reference):
blocking -> pairwise scoring -> cascade linkage -> transitive clustering,
expressed with the Spark DataFrame API so Catalyst/Tungsten/AQE pick the
physical strategy. The reference delegates tokenization, candidate retrieval
and relevance scoring to an external Elasticsearch 5.x server; here those
semantics are recomputed DataFrame-natively:

  * ES analyzers            -> functions.analyzers (token-array columns)
  * inverted-index top-k    -> operators.blocking (explode + salted hash join)
                               + operators.scoring (TF-IDF / string similarity)
  * bool must/should query  -> operators.scoring.compose_matcher
  * priority query cascade  -> operators.cascade (es_match.py semantics)
  * (new, per north rule)   -> operators.clustering connected components

Layout:
  functions/  pure column-level functions (analyzers, similarity, text proj)
  operators/  DataFrame -> DataFrame relational operators
  sources/    session, synthetic data generators, checkpoint I/O
  plans/      pipeline assembly, matcher config, calibration
  streaming/  incremental (Structured Streaming) ingest of documents
"""

__version__ = "0.1.0"
