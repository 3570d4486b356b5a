"""Local stand-in for the driver's correctness gate: runs every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet, compares row count, column names, and order-insensitive
values (ints by value, floats bit-compared after float64 coercion,
with a tiny ulp tolerance report).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from veealign_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("bool")
        else:
            out[c] = s.astype("string")
    out = out[sorted(out.columns)]
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        errs.append(f"columns: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return errs
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"rows: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                av, bv = a[c].to_numpy(), b[c].to_numpy()
                ok = (av == bv) | (np.isnan(av) & np.isnan(bv)) | np.isclose(av, bv, rtol=0, atol=1e-12)
                if not ok.all():
                    i = int(np.argmin(ok))
                    errs.append(f"float col {c}: first diff row {i}: {av[i]!r} vs {bv[i]!r}")
            else:
                if not a[c].equals(b[c]):
                    diff = a[c] != b[c]
                    i = int(np.argmax(diff.to_numpy()))
                    errs.append(f"col {c}: first diff row {i}: {a[c][i]!r} vs {b[c][i]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # data-derived oracles (portable IVF centroids) must read the same
    # scale factor this check runs at
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark("contract-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(spark_pdf)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        errs = compare(name, spark_pdf, duck_pdf)
        if errs:
            failures += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for e in errs[:4]:
                print(f"     {e}")
        else:
            print(f"PASS {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
