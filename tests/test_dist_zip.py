"""Version-skew guard: if a dist/veealign_spark.zip exists (built by
tools/make_pyfiles.py for spark-submit --py-files), its module bytes
must match the source tree — executors importing stale code while the
driver runs current code is a silent-corruption trap."""

from __future__ import annotations

import os
import zipfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(ROOT, "dist", "veealign_spark.zip")


@pytest.mark.skipif(not os.path.exists(ZIP), reason="no dist zip built")
def test_dist_zip_matches_source():
    with zipfile.ZipFile(ZIP) as zf:
        names = set(zf.namelist())
        # every source module present and byte-identical
        for r, _d, files in os.walk(os.path.join(ROOT, "veealign_spark")):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(r, fn)
                rel = os.path.relpath(full, ROOT)
                assert rel in names, f"{rel} missing from zip — rerun tools/make_pyfiles.py"
                assert zf.read(rel) == open(full, "rb").read(), (
                    f"{rel} is stale in dist zip — rerun tools/make_pyfiles.py"
                )
