"""Build the --py-files zip for spark-submit deployment:

    python tools/package.py  ->  dist/aml_entity_resolution_assignment_spark.zip

The zip contains only the engine package (no tests/tools/driver
files); executors unpack it onto sys.path, which is how the north
rule's `spark-submit --py-files` deployment ships code to a cluster.
"""

from __future__ import annotations

import os
import zipfile

PKG = "aml_entity_resolution_assignment_spark"


def build(repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dist = os.path.join(root, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, f"{PKG}.zip")
    src = os.path.join(root, PKG)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(src):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, root)
                zf.write(full, rel)
    return out


if __name__ == "__main__":
    print(build())
