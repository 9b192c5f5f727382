"""A/B: window LWW resolve vs map-side pre-aggregated (max_by) resolve.

Round-3 measurement for the one remaining big shuffle lever: the
window formulation shuffles EVERY event into the resolve exchange
(the min-over-partition metrics column blocks the WindowGroupLimit
rank pushdown), while groupBy(keys).agg(max_by(payload, rank)) gets
Spark's partial aggregation — intra-map-task duplicate keys collapse
BEFORE the exchange. Equal semantics since round 3's total equal-LSN
tie-break (verified by tests/test_round3_fixes.py and an in-script
row-count cross-check).

Protocol (same discipline as bench_scaling.py): one pre-written
change stream; each timed run in its own subprocess with file-backed
output; JIT warmup from the same parquet source; best-of-N. Two
regimes per strategy:
  bulk — apply the full stream to an empty table (intra-batch dupes
         dominate: partial agg's best case);
  incr — apply a 1/16 tail slice onto the table built from the rest
         (steady state: touched base rows dominate the exchange).
num_buckets == shuffle_partitions so BOTH strategies get the
single-exchange bucket-aligned write (the agg's own exchange is
hashpartitioning(keys, shuffle_partitions)).

Usage: python bench_ab_resolve.py          # orchestrates
       AB_EVENTS=8000000 AB_CPUS=8 python bench_ab_resolve.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

EVENTS = int(os.environ.get("AB_EVENTS", "32000000"))
CONVS = EVENTS // 40
CPUS = int(os.environ.get("AB_CPUS", "8"))
REPEATS = int(os.environ.get("AB_REPEATS", "2"))

from oregonwaterdataportal_etl_spark.cdc.changegen import (  # noqa: E402
    TRANSCRIPT_DICT_COLS as DICT_COLS,
)


def worker(strategy: str, regime: str, stream_dir: str, workdir: str) -> None:
    import uuid

    from oregonwaterdataportal_etl_spark.cdc.changegen import TRANSCRIPT_SCHEMA
    from oregonwaterdataportal_etl_spark.lake import LakeTable
    from oregonwaterdataportal_etl_spark.session import get_spark

    nb = CPUS * 4
    spark = get_spark(
        app_name=f"ab-{strategy}-{regime}",
        master=f"local[{CPUS}]",
        shuffle_partitions=nb,
    )
    run_id = uuid.uuid4().hex[:8]

    def fresh(name):
        return LakeTable.create(
            os.path.join(workdir, f"{name}-{run_id}"),
            TRANSCRIPT_SCHEMA,
            key_cols=["conv_id", "turn_idx"],
            num_buckets=nb,
            dict_cols=DICT_COLS,
        )

    warm = fresh("warm")
    warm.merge(
        spark.read.parquet(stream_dir).limit(50_000), resolve_strategy=strategy
    )

    table = fresh("table")
    changes = spark.read.parquet(stream_dir)
    cut = int(EVENTS * 15 / 16)
    if regime == "incr":
        # build the base OUTSIDE the timed section (window strategy —
        # identical base files either way), then time the tail apply
        table.merge(changes.filter(f"lsn < {cut}"))
        batch = changes.filter(f"lsn >= {cut}")
        n_timed = EVENTS - cut
    else:
        batch = changes
        n_timed = EVENTS
    t0 = time.perf_counter()
    res = table.merge(batch, resolve_strategy=strategy)
    elapsed = time.perf_counter() - t0
    print(json.dumps({
        "strategy": strategy, "regime": regime, "cpus": CPUS,
        "sec": round(elapsed, 3),
        "events_per_sec": round(n_timed / elapsed, 1),
        "rows": res.rows_inserted + res.rows_updated + res.rows_noop,
    }))
    spark.stop()


def generate(stream_dir: str) -> None:
    from oregonwaterdataportal_etl_spark.cdc import generate_changes
    from oregonwaterdataportal_etl_spark.session import get_spark

    spark = get_spark(app_name="ab-gen", master="local[32]")
    generate_changes(
        spark, EVENTS, CONVS, seed=42, zipf_a=1.1, partitions=128
    ).write.mode("overwrite").parquet(stream_dir)
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "worker":
        worker(sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5])
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "generate":
        generate(sys.argv[2])
        return

    workdir = tempfile.mkdtemp(prefix="bench_ab_")
    stream_dir = os.path.join(workdir, "stream")
    here = os.path.dirname(os.path.abspath(__file__))

    def run_stage(args: list[str]) -> str:
        tag = "_".join(args[:3]).replace("/", "_")
        out_path = os.path.join(workdir, f"out-{tag}.log")
        with open(out_path, "w") as out_f:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), *args],
                stdout=out_f, stderr=subprocess.DEVNULL, check=True, cwd=here,
                env={**os.environ, "AB_EVENTS": str(EVENTS), "AB_CPUS": str(CPUS)},
            )
        with open(out_path) as f:
            lines = [l for l in f.read().splitlines() if l.startswith("{")]
        return lines[-1] if lines else "{}"

    run_stage(["generate", stream_dir])
    out = {"metric": "resolve_strategy_ab", "events": EVENTS, "cpus": CPUS}
    rows_check: dict[str, int] = {}
    for regime in ("bulk", "incr"):
        for strategy in ("window", "agg"):
            runs = [
                json.loads(run_stage(["worker", strategy, regime, stream_dir, workdir]))
                for _ in range(REPEATS)
            ]
            best = min(runs, key=lambda r: r["sec"])
            out[f"{regime}_{strategy}_sec"] = best["sec"]
            out[f"{regime}_{strategy}_events_per_sec"] = best["events_per_sec"]
            rows_check.setdefault(regime, best["rows"])
            assert rows_check[regime] == best["rows"], (
                f"strategies disagree on merged row counts in {regime}: "
                f"{rows_check[regime]} vs {best['rows']}"
            )
        out[f"{regime}_agg_vs_window"] = round(
            out[f"{regime}_window_sec"] / out[f"{regime}_agg_sec"], 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
