"""kgx — a from-scratch, PySpark-native knowledge-graph construction engine.

Capabilities mirror kornkamol-s/LLMInformationExtraction (see SURVEY.md for the
operator-by-operator mapping with file:line citations into /root/reference),
re-expressed Spark-first: lazy DataFrame plans, Arrow-batched pandas UDFs for the
text kernels, built-in functions everywhere else, MinHash-LSH blocking + iterative
connected components for entity canonicalization, and manifest-backed atomic
snapshot commits (Iceberg-style semantics without the Iceberg jar, which is not on
this classpath — the write path is isolated in ``kgx.checkpoint`` so a real
deployment swaps in ``df.writeTo(...).append()``).
"""

__version__ = "0.1.0"
