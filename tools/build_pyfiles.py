"""Package the engine for ``spark-submit --py-files`` (north-rule launch mode).

Produces ``dist/sonata_neo4j_loader_spark.zip`` containing the package —
importable on every executor when shipped via ``--py-files``.

Usage:  python tools/build_pyfiles.py  [outdir]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "sonata_neo4j_loader_spark"


def build(outdir: str | None = None) -> str:
    outdir = outdir or os.path.join(REPO, "dist")
    os.makedirs(outdir, exist_ok=True)
    zpath = os.path.join(outdir, f"{PKG}.zip")
    pkg_root = os.path.join(REPO, PKG)
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return zpath


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
