"""spark-submit entry point: build or refresh a versioned ANN index.

Usage:

    spark-submit --master <cluster> --py-files dist/owdp_etl_spark.zip \
        jobs/build_index.py <table_dir> <index_dir> [kind] [vec_col] [id_col]

kind: lsh (default) or ivf. Builds the index if it has never been
built, refreshes it if the table's logical rows changed since the
indexed snapshot, and no-ops otherwise (compaction/vacuum churn does
not trigger a rebuild). Retries through snapshot races with a
concurrently-running builder or runner. Prints one JSON line.
"""

import json
import sys

from pyspark.sql import SparkSession

from oregonwaterdataportal_etl_spark.lake import LakeTable
from oregonwaterdataportal_etl_spark.lake.table import retry_on_conflict
from oregonwaterdataportal_etl_spark.operators.ann_index import AnnIndex


def main() -> None:
    table_dir, index_dir = sys.argv[1:3]
    kind = sys.argv[3] if len(sys.argv) > 3 else "lsh"
    vec_col = sys.argv[4] if len(sys.argv) > 4 else "embedding"
    id_col = sys.argv[5] if len(sys.argv) > 5 else "vec_id"
    spark = SparkSession.builder.appName("owdp-build-index").getOrCreate()
    table = LakeTable(table_dir)
    ix = AnnIndex(index_dir, table, kind=kind, vec_col=vec_col, id_col=id_col)

    # sample staleness INSIDE the retried closure so a racing builder
    # can't produce an inconsistent was_stale/rebuilt pair in the report
    state = {"was_stale": False}

    def refresh():
        state["was_stale"] = ix.stale()
        return ix.refresh_if_stale(spark)

    new_version = retry_on_conflict(refresh)
    removed = ix.vacuum()
    man = ix.manifest()
    print(
        json.dumps(
            {
                "was_stale": state["was_stale"],
                "rebuilt": new_version is not None,
                "index_version": ix.current_version(),
                "table_version": man["table_version"],
                # the SERVED kind (from the manifest), plus a drift flag:
                # stale() only tracks table rows, so invoking with a
                # different kind against an existing fresh index does NOT
                # rebuild — surface that instead of misreporting
                "kind": man["kind"],
                "kind_mismatch": man["kind"] != kind,
                "layouts_vacuumed": removed,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
