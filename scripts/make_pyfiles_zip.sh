#!/bin/sh
# Package the engine for spark-submit --py-files (north rule launch mode):
#   scripts/make_pyfiles_zip.sh
#   spark-submit --py-files dist/extractor_spark.zip jobs/extract_pipeline.py --from-submit ...
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/extractor_spark.zip
python -c "
import zipfile, pathlib
zf = zipfile.ZipFile('dist/extractor_spark.zip', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('extractor_spark').rglob('*.py')):
    zf.write(p, p.as_posix())
zf.close()
print('dist/extractor_spark.zip written')
"
