"""Build dist/veealign_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile


def main() -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "veealign_spark")
    os.makedirs(os.path.join(root, "dist"), exist_ok=True)
    out = os.path.join(root, "dist", "veealign_spark.zip")
    with zipfile.ZipFile(out, "w") as zf:
        for r, _d, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(r, fn)
                    zf.write(full, os.path.relpath(full, root))
    print(out)
    return out


if __name__ == "__main__":
    main()
