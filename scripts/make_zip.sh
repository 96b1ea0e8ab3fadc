#!/bin/sh
# Package beats_spark for spark-submit --py-files.
cd "$(dirname "$0")/.." || exit 1
rm -f beats_spark.zip
zip -qr beats_spark.zip beats_spark -i '*.py'
echo "built $(pwd)/beats_spark.zip"
