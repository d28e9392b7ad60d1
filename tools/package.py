"""Build dx.zip for `spark-submit --py-files` (north_rule run mode).

    python tools/package.py            # -> dist/dx.zip
    spark-submit --py-files dist/dx.zip dx/main.py replay --workdir ...

The zip contains only the dx package (no tests/tools); executors
import it from the distributed archive while the driver runs
dx/main.py directly.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "dx.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "dx")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
