"""Build the --py-files zip for spark-submit deployment.

    python -m silkworm_spark.package [outdir]

Produces ``dist/silkworm_spark.zip`` containing the package — the
artifact the north rule's "ships via spark-submit --py-files" refers
to. Executors unpack it onto their PYTHONPATH; no install step.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build_zip(outdir: str = "dist") -> str:
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(pkg_root)
    os.makedirs(os.path.join(repo, outdir), exist_ok=True)
    out = os.path.join(repo, outdir, "silkworm_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, repo)
                z.write(full, rel)
    return out


if __name__ == "__main__":
    print(build_zip(sys.argv[1] if len(sys.argv) > 1 else "dist"))
