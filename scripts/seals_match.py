"""SEALS-style CLI: match two ontologies, print the alignment file URL.

Usage: python scripts/seals_match.py <onto1> <onto2> [output_dir]

Mirrors the reference SEALS wrapper's contract (SEALS-OAEI.py:12-16,
355-368): two ontology paths or file:// URLs in, one Alignment-RDF
file out, its file:// URL printed on stdout. Add --one-to-one for the
canonical test.py symmetric-best resolution before writing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from veealign_spark.plans.seals import match  # noqa: E402
from veealign_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--one-to-one"]
    one_to_one = "--one-to-one" in sys.argv[1:]
    if len(args) < 2:
        print(__doc__)
        sys.exit(2)
    out_dir = args[2] if len(args) > 2 else "."
    spark = get_spark("seals-match")
    res = match(spark, args[0], args[1], out_dir, one_to_one=one_to_one)
    print("file://" + os.path.abspath(res["path"]))


if __name__ == "__main__":
    main()
