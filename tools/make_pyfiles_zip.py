"""Package the library as a --py-files zip for spark-submit.

    python tools/make_pyfiles_zip.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "siem_on_amazon_opensearch_service_spark"


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(root, "pkg.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(os.path.join(root, PKG)):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    print(out)


if __name__ == "__main__":
    main()
