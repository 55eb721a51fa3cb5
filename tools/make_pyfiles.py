"""Package the engine for spark-submit --py-files (dist/covergrid.zip)."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    os.makedirs(f"{ROOT}/dist", exist_ok=True)
    out = f"{ROOT}/dist/covergrid.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = f"{ROOT}/parallelcovertree_spark"
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
