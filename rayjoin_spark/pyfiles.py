"""Build the --py-files zip for spark-submit on a real cluster.

    python -m rayjoin_spark.pyfiles /tmp/rayjoin_spark.zip
    spark-submit --py-files /tmp/rayjoin_spark.zip your_job.py
"""

from __future__ import annotations

import os
import sys
import zipfile


def build_zip(out_path: str) -> str:
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    base = os.path.dirname(pkg_root)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, base))
    return out_path


if __name__ == "__main__":
    print(build_zip(sys.argv[1] if len(sys.argv) > 1 else "rayjoin_spark.zip"))
