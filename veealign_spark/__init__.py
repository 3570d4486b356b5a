"""veealign_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of Remorax/VeeAlign
(EMNLP 2021 dual-attention ontology alignment) as an idiomatic PySpark
pipeline: triple extraction from transcripts, multifaceted-context
construction, blocked candidate generation, a batched dual-attention
entity-linking kernel inside Arrow pandas UDFs, connected-components
canonicalization, and deduplicated KG materialization with lineage,
metrics and stage-checkpoint resumability.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the public VeeAlign repository studied as a behavioral
reference (cited file:line in docstrings), and published papers.
"""

__version__ = "0.1.0"
