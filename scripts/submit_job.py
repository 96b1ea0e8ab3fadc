"""spark-submit entry point: run the flagship pipeline over a token
table and write the fan-out + metrics (the production deployment shape,
BASELINE north_star: `spark-submit --py-files beats_spark.zip
scripts/submit_job.py <input_parquet> <out_dir>`).

On a cluster, drop the local[] master and let spark-submit supply it;
beats_spark.zip is built with `scripts/make_zip.sh` (or any zip of the
beats_spark package)."""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    input_dir, out_dir = sys.argv[1], sys.argv[2]
    n_chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = SparkSession.builder.appName("beats_spark_job").getOrCreate()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    from beats_spark.checkpoint import CheckpointedRunner
    from beats_spark.flagship import flagship_config
    from beats_spark.pipeline import Pipeline

    df = spark.read.parquet(input_dir)
    pipe = Pipeline(flagship_config())
    runner = CheckpointedRunner(
        spark, out_dir, n_chunks=n_chunks, source_snapshot=input_dir
    )
    committed = runner.run(df, pipe.transform)
    total = runner.manifest().groupBy().sum("row_count").collect()[0][0]
    print(json.dumps({"chunks_committed": committed, "rows_total": int(total or 0)}))
    spark.stop()


if __name__ == "__main__":
    main()
