"""Build the --py-files zip for spark-submit deployment."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(out: str = "dqc.zip") -> str:
    target = os.path.join(REPO, out)
    pkg = os.path.join(REPO, "data_quality_checker_spark")
    with zipfile.ZipFile(target, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(target)
    return target


if __name__ == "__main__":
    main()
