"""spark-submit entry point: apply a change-event stream to a lake table.

Usage (north_rule packaging surface):

    python package.py   # builds dist/owdp_etl_spark.zip
    spark-submit --master <cluster> --py-files dist/owdp_etl_spark.zip \
        jobs/apply_changes.py <stream_parquet_dir> <table_dir> \
        <offsets_dir> <manifests_dir> [window_size]

The package arrives on executors via --py-files; this script imports it
exactly as a cluster job would (no sys.path surgery). Prints one JSON
line of per-run metrics (rows, windows, final offset) to stdout.
"""

import json
import sys

from pyspark.sql import SparkSession

from oregonwaterdataportal_etl_spark.cdc import (
    CdcRunner,
    LsnRangedParquetSource,
    ManifestLog,
    OffsetLog,
)
from oregonwaterdataportal_etl_spark.cdc.changegen import TRANSCRIPT_SCHEMA
from oregonwaterdataportal_etl_spark.lake import LakeTable


def main() -> None:
    stream_dir, table_dir, offsets_dir, manifests_dir = sys.argv[1:5]
    window = int(sys.argv[5]) if len(sys.argv) > 5 else 1_000_000
    spark = SparkSession.builder.appName("owdp-apply-changes").getOrCreate()
    table = LakeTable(table_dir)
    if not table.exists():
        table = LakeTable.create(
            table_dir, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], num_buckets=16
        )
    runner = CdcRunner(
        table,
        OffsetLog(offsets_dir),
        ManifestLog(manifests_dir),
        # footer-stat file pruning: each window plans only its own
        # files, and the resume loop's high-water mark is metadata-only
        source=LsnRangedParquetSource(spark, stream_dir),
    )
    results = runner.run_available(window_size=window)
    print(
        json.dumps(
            {
                "windows_applied": len(results),
                "final_offset": OffsetLog(offsets_dir).last_lsn(),
                "rows_final": table.read(spark).count(),
                "version": table.current_version(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
