"""PySpark-native near-duplicate detection + clustering engine.

A from-scratch Spark-first re-expression of the query/data-processing
capabilities of ``ugurcanaltun/cs588-data-science-bug-duplicate-detector``
(reference at /root/reference, read-only): ingest web-scale documents,
normalize text, generate MinHash/SimHash/suffix signatures, LSH-join
candidate duplicate pairs, run connected components, and score retrieval
quality (Recall@k / MRR / MAP@k) — all as DataFrame programs with
vectorized Arrow UDFs (no per-row Python).
"""

__version__ = "0.1.0"
