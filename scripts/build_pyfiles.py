"""Build the --py-files zip for spark-submit (north rule launch mode).

    python scripts/build_pyfiles.py
    spark-submit --master <cluster> \
        --py-files dist/events_validator_spark.zip dist/run_validation.py \
        --docs 1000000 --out /data/run1
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "events_validator_spark"

RUNNER = '''"""Thin spark-submit driver: the package arrives via --py-files."""
from events_validator_spark.__main__ import main

if __name__ == "__main__":
    main()
'''


def main() -> None:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, f"{PKG}.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    with open(os.path.join(dist, "run_validation.py"), "w") as f:
        f.write(RUNNER)
    print(zpath)


if __name__ == "__main__":
    main()
