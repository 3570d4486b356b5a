"""Explicit StructType schemas for every table in the engine.

Data-model mapping from the reference (SURVEY.md §1): the reference's
row-oriented Python dicts/tuples become columnar DataFrames with fixed
schemas. Reference shapes cited per table.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Primary source (BASELINE.json input_hint — exact shape).
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# Mentions exploded out of transcript text (one row per extracted triple
# occurrence; span = character offset of the match).
MENTIONS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("src", T.StringType(), False),
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("span", T.IntegerType(), True),
    ]
)

# Canonical edge table (reference: 4-tuple (domain, range, property,
# prop_type), ontology.py:94-128; kind in {'Object Property',
# 'Datatype Property', 'Subclass'} per ontology.py:103).
TRIPLES = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
    ]
)

CONCEPTS = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
    ]
)

# Root paths (reference: path_to_root lists, data_preprocessing.py:85-96).
PATHS = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("entity", T.StringType(), False),
        T.StructField("path", T.ArrayType(T.StringType()), False),
    ]
)

# Demarcated neighbourhood contexts (reference 4-slot layout,
# data_preprocessing.py:254-309): nbr_type 0=root-paths, 1=children,
# 2=object-prop neighbours, 3=datatype-prop neighbours.
CONTEXTS = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("entity", T.StringType(), False),
        T.StructField("nbr_type", T.IntegerType(), False),
        T.StructField("path", T.ArrayType(T.StringType()), False),
    ]
)

PROP_CONTEXTS = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("prop", T.StringType(), False),
        T.StructField("domains", T.ArrayType(T.StringType()), False),
        T.StructField("ranges", T.ArrayType(T.StringType()), False),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("idx", T.LongType(), False),
        T.StructField("vec", T.ArrayType(T.FloatType()), False),
    ]
)

ALIGNMENTS = T.StructType(
    [
        T.StructField("ent1", T.StringType(), False),
        T.StructField("ent2", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("accepted", T.BooleanType(), False),
        T.StructField("is_prop", T.BooleanType(), False),
    ]
)

GOLD = T.StructType(
    [
        T.StructField("ent1", T.StringType(), False),
        T.StructField("ent2", T.StringType(), False),
        T.StructField("relation", T.StringType(), False),
        T.StructField("measure", T.DoubleType(), False),
    ]
)

CLUSTERS = T.StructType(
    [
        T.StructField("entity", T.StringType(), False),
        T.StructField("canon_id", T.StringType(), False),
    ]
)
