"""Text-normalization functions (reference F1-F5, SURVEY.md §2.6).

All implemented as JVM-side Column expressions — no Python UDFs — so
they stay inside whole-stage codegen and scale linearly with input.

Reference semantics reproduced:
- camel split  (data_preprocessing.py:152-155): `ConferenceMember` ->
  `Conference Member` (also splits acronym boundaries: `PCMember` ->
  `PC Member`).
- underscore split (data_preprocessing.py:157-158): `_` -> space.
- selective lowercase (data_preprocessing.py:160-176): tokens that are
  not all-caps acronyms are lowercased.
- stopword removal + hyphen strip (data_preprocessing.py:233-240):
  stopword list is ["has"]; `-` -> ` `.

A pure-Python mirror (`normalize_term`) is provided for driver-side
fixture generation and oracle checks — it must stay in lockstep with
the Column version (tested in tests/test_text_norm.py).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Split lowercase->Uppercase and AcronymUpper->Word boundaries.
CAMEL_BOUNDARY = "(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])"
ACRONYM_RE = "^[A-Z][A-Z0-9]+$"
STOPWORDS = ["has"]


def camel_split_col(c: Column) -> Column:
    """F1: insert spaces at camel-case boundaries."""
    return F.regexp_replace(c, CAMEL_BOUNDARY, " ")


def underscore_split_col(c: Column) -> Column:
    """F2: underscores and hyphens to spaces."""
    return F.regexp_replace(c, "[_-]", " ")


def norm_label_col(c: Column) -> Column:
    """F1+F2+F4+F5 composition: split camel/underscore, selectively
    lowercase non-acronym tokens, drop stopwords, squeeze spaces."""
    split = camel_split_col(underscore_split_col(c))
    toks = F.split(F.trim(F.regexp_replace(split, " +", " ")), " ")
    lowered = F.transform(
        toks,
        lambda w: F.when(w.rlike(ACRONYM_RE), w).otherwise(F.lower(w)),
    )
    kept = F.filter(lowered, lambda w: ~w.isin(*STOPWORDS) & (w != ""))
    return F.array_join(kept, " ")


_CAMEL_RE = re.compile(CAMEL_BOUNDARY)
_ACRO_RE = re.compile(ACRONYM_RE)


def normalize_term(s: str) -> str:
    """Python mirror of norm_label_col (must match exactly)."""
    s = re.sub("[_-]", " ", s)
    s = _CAMEL_RE.sub(" ", s)
    s = re.sub(" +", " ", s).strip()
    toks = []
    for w in s.split(" "):
        if not w:
            continue
        w = w if _ACRO_RE.match(w) else w.lower()
        if w in STOPWORDS:
            continue
        toks.append(w)
    return " ".join(toks)


def cosine_expr(a: Column, b: Column) -> Column:
    """F6: cosine similarity between two array<float/double> columns as
    a pure SQL expression (zip_with dot products + aggregate) — used for
    the direct-input fallback (A6) and ANN baselines. JVM-side, no UDF."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / F.greatest(na * nb, F.lit(1e-12))
