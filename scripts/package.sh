#!/bin/sh
# Build the --py-files artifact for spark-submit.
set -e
cd "$(dirname "$0")/.."
rm -f readability_ex_spark.zip
python - <<'PY'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("readability_ex_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("readability_ex_spark/**/*.py")):
        z.write(p, p.as_posix())
print("wrote readability_ex_spark.zip")
PY
