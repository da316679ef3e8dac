"""Build dist/srag_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    dist = ROOT / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "srag_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(ROOT / "srag_spark"):
            for fn in filenames:
                if fn.endswith(".py"):
                    p = Path(dirpath) / fn
                    zf.write(p, p.relative_to(ROOT))
    print(out)


if __name__ == "__main__":
    main()
