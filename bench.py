"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the engine's
own CDC-replay throughput benchmark (synthetic change stream ->
LakeTable MERGE), and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "cdc_events_per_sec": ...}

Scaling protocol (BENCH.md): SPARK_GRAFT_CPUS=8 vs 32 on the same
input gives the two-cluster-size datapoints.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from oregonwaterdataportal_etl_spark.session import get_spark

HEADLINE = [
    "tpch1_agg",
    "filter_project",
    "two_hop_star_join",
    "lww_window",
    "cdc_lww_fold",
    "argmax_dedup",
    "month_histogram",
    "sessionization",
    "asof_join",
    "having_threshold",
    "token_stats",
    "exact_dedup_docs",
    "md5_fingerprint",
    "embedding_topk",
    "minhash_neardup",
]

CDC_EVENTS = int(os.environ.get("BENCH_CDC_EVENTS", "2000000"))
CDC_CONVS = CDC_EVENTS // 40


# transcript enum dictionaries: declared next to the generator's value
# arrays so they cannot drift (cdc/changegen.TRANSCRIPT_DICT_COLS)
from oregonwaterdataportal_etl_spark.cdc.changegen import (  # noqa: E402
    TRANSCRIPT_DICT_COLS as DICT_COLS,
)

def cpu_probe() -> float:
    """Fixed single-thread work unit (20M-iteration integer loop),
    returns ns/iter. The host's effective clock varies across sessions
    (BENCH.md §4: external tenants, measured 1.6-2.1x uniform drift on
    code-identical queries between rounds 3 and 4) — this probe rides
    in every bench JSON so a reader can normalize absolute seconds
    across host windows before calling anything a regression."""
    n = 20_000_000
    t0 = time.perf_counter()
    acc = 0
    for i in range(n):
        acc += i * i
    dt = time.perf_counter() - t0
    return round(dt / n * 1e9, 2)


def _baseline_rev() -> str | None:
    """The code baseline to A/B against: $BENCH_BASELINE_REV, else the
    latest driver round-boundary commit ('round N: ...'), i.e. the
    previous round's code."""
    rev = os.environ.get("BENCH_BASELINE_REV")
    if rev:
        return rev
    import subprocess

    try:
        out = subprocess.run(
            ["git", "log", "--grep=^round ", "--format=%H", "-1"],
            capture_output=True, text=True, timeout=30,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        rev = out.stdout.strip()
        return rev or None
    except Exception:
        return None


def _run_bench_subprocess(bench_dir: str) -> dict | None:
    """Run ``bench.py`` from ``bench_dir`` in its own process (own JVM;
    never concurrent with another session) and parse its JSON line."""
    import subprocess

    env = dict(os.environ)
    env["BENCH_NO_BASELINE"] = "1"  # sub-draws must not recurse
    env.pop("PYTHONPATH", None)
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(bench_dir, "bench.py")],
            capture_output=True, text=True, timeout=3600, cwd=bench_dir,
            env=env,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except Exception:
        pass
    return None


def run_baseline(rev: str) -> dict | None:
    """Same-session prior-code draw: check the baseline rev out into a
    temporary git worktree and run ITS bench.py in a subprocess.
    Returns the parsed baseline JSON, or None on any failure — the
    primary metrics must never be lost to the comparison's problems."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    wt = tempfile.mkdtemp(prefix="bench_baseline_wt_")
    try:
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, rev],
            check=True, capture_output=True, timeout=120, cwd=repo,
        )
        return _run_bench_subprocess(wt)
    except Exception:
        return None
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            capture_output=True, timeout=60, cwd=repo,
        )
        shutil.rmtree(wt, ignore_errors=True)


def time_query(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def bench_cdc(spark, workdir: str) -> dict:
    """CDC replay: distributed synthetic stream -> parquet -> MERGE.
    Generation+write is setup; the timed section is the end-to-end
    apply (read, LWW rank, salted write, commit)."""
    from oregonwaterdataportal_etl_spark.cdc import generate_changes
    from oregonwaterdataportal_etl_spark.cdc.changegen import TRANSCRIPT_SCHEMA
    from oregonwaterdataportal_etl_spark.lake import LakeTable

    stream_dir = os.path.join(workdir, "stream")
    nparts = spark.sparkContext.defaultParallelism
    generate_changes(
        spark, CDC_EVENTS, CDC_CONVS, seed=42, zipf_a=1.1, partitions=nparts
    ).write.mode("overwrite").parquet(stream_dir)

    # JIT/codegen warmup on a throwaway table so the timed merge
    # measures steady-state throughput, not first-plan compilation.
    # Warm from the written stream, NOT the python generator: resident
    # mapInPandas workers measurably slow the subsequent JVM-only merge.
    warm = LakeTable.create(
        os.path.join(workdir, "warm"),
        TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=8,
        dict_cols=DICT_COLS,
    )
    warm.merge(spark.read.parquet(stream_dir).limit(50_000))

    table = LakeTable.create(
        os.path.join(workdir, "table"),
        TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=max(nparts, 16),
        dict_cols=DICT_COLS,
    )
    changes = spark.read.parquet(stream_dir)
    t0 = time.perf_counter()
    result = table.merge(changes)
    elapsed = time.perf_counter() - t0

    # merge-on-read apply (the high-rate ingest path): append-only
    mor_table = LakeTable.create(
        os.path.join(workdir, "table_mor"),
        TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=max(nparts, 16),
        dict_cols=DICT_COLS,
    )
    t0 = time.perf_counter()
    mor_table.merge(changes, mode="mor")
    mor_elapsed = time.perf_counter() - t0

    # incremental steady-state apply: a 10%-sized later window onto the
    # loaded base — the shape every window after the first actually has
    incr_events = CDC_EVENTS // 10
    incr_dir = os.path.join(workdir, "stream_incr")
    generate_changes(
        spark, incr_events, CDC_CONVS, seed=43, zipf_a=1.1,
        lsn_start=CDC_EVENTS, partitions=max(nparts // 4, 4),
    ).write.mode("overwrite").parquet(incr_dir)
    incr = spark.read.parquet(incr_dir)
    t0 = time.perf_counter()
    table.merge(incr)
    incr_elapsed = time.perf_counter() - t0
    t0 = time.perf_counter()
    mor_table.merge(incr, mode="mor")
    incr_mor_elapsed = time.perf_counter() - t0

    # zero-exchange incremental apply: the same 10% window pre-bucketed
    # as a WAL (producer-side cost, untimed) through merge_prebucketed
    # — the no-shuffle steady-state path (DESIGN.md §11); the cow table
    # above already absorbed this window, so replay it onto a fresh
    # copy built the same way
    from oregonwaterdataportal_etl_spark.lake import write_bucketed_wal

    zx_table = LakeTable.create(
        os.path.join(workdir, "table_zx"),
        TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=max(nparts, 16),
        dict_cols=DICT_COLS,
    )
    zx_table.merge(changes)
    wal_dir = os.path.join(workdir, "wal_incr")
    write_bucketed_wal(incr, wal_dir, max(nparts, 16), ["conv_id", "turn_idx"])
    t0 = time.perf_counter()
    zx_table.merge_prebucketed(spark, wal_dir)
    incr_zx_elapsed = time.perf_counter() - t0

    # time-partitioned incremental apply: the same 10% window through
    # the day-routed zero-exchange tree (days(ts) x bucket(key) —
    # BENCH.md §10's aged-table steady state). The generator's ts is
    # lsn-derived seconds, so the base spans ~23 days and the window
    # lands on the last ~2 — the real routing shape. Producer WAL
    # writes untimed, as for the flat zx path above.
    from oregonwaterdataportal_etl_spark.lake import (
        PartitionedLakeTable,
        write_partitioned_wal,
    )

    pt_table = PartitionedLakeTable.create(
        os.path.join(workdir, "table_pt"),
        TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        partition_col="ts",
        num_buckets=8,
        dict_cols=DICT_COLS,
    )
    pwal = os.path.join(workdir, "pwal")
    pt_table.merge_prebucketed(
        spark, write_partitioned_wal(changes, pwal, pt_table)
    )
    pt_batch = write_partitioned_wal(incr, pwal, pt_table)
    t0 = time.perf_counter()
    pt_table.merge_prebucketed(spark, pt_batch)
    incr_pt_elapsed = time.perf_counter() - t0

    # envelope front-end decode: the incremental window wrapped as
    # wire JSON (producer cost, untimed); timed = parse + quarantine +
    # transaction gate over the wire (one from_json, one txn-window)
    from oregonwaterdataportal_etl_spark.cdc import (
        ingest_envelopes,
        wrap_envelopes,
    )

    wire_dir = os.path.join(workdir, "wire_incr")
    wrap_envelopes(incr).write.mode("overwrite").parquet(wire_dir)
    wire = spark.read.parquet(wire_dir)
    env_elapsed, n_ready = None, 0
    for _ in range(2):  # best-of-2: first draw pays the cold page cache
        t0 = time.perf_counter()
        ready, _dlq, _still = ingest_envelopes(wire, TRANSCRIPT_SCHEMA)
        n_ready = ready.count()
        dt = time.perf_counter() - t0
        env_elapsed = dt if env_elapsed is None or dt < env_elapsed else env_elapsed
    # clean wire: every event must survive decode (reported, not
    # asserted — a correctness surprise must not cost the bench JSON)
    return {
        "envelope_ingest_sec": round(env_elapsed, 3),
        "envelope_events_per_sec": round(incr_events / env_elapsed, 1),
        "envelope_ready_rows": n_ready,
        "cdc_incr_zx_apply_sec": round(incr_zx_elapsed, 3),
        "cdc_incr_zx_events_per_sec": round(incr_events / incr_zx_elapsed, 1),
        "cdc_incr_pt_apply_sec": round(incr_pt_elapsed, 3),
        "cdc_incr_pt_events_per_sec": round(incr_events / incr_pt_elapsed, 1),
        "cdc_apply_sec": round(elapsed, 3),
        "cdc_events": CDC_EVENTS,
        "cdc_events_per_sec": round(CDC_EVENTS / elapsed, 1),
        "cdc_mor_apply_sec": round(mor_elapsed, 3),
        "cdc_mor_events_per_sec": round(CDC_EVENTS / mor_elapsed, 1),
        "cdc_incr_events": incr_events,
        "cdc_incr_apply_sec": round(incr_elapsed, 3),
        "cdc_incr_events_per_sec": round(incr_events / incr_elapsed, 1),
        "cdc_incr_mor_apply_sec": round(incr_mor_elapsed, 3),
        "cdc_incr_mor_events_per_sec": round(incr_events / incr_mor_elapsed, 1),
        "cdc_rows_final": result.rows_inserted,
    }


def main() -> None:
    t_main0 = time.perf_counter()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name=f"bench-local[{cpus}]", master=f"local[{cpus}]")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    times: dict[str, float] = {}
    # one warmup to amortize JVM/codegen startup out of per-query times
    time_query(spark, qs["filter_project"], sf_dir)
    for name in HEADLINE:
        times[name] = round(time_query(spark, qs[name], sf_dir), 3)

    workdir = tempfile.mkdtemp(prefix="bench_cdc_")
    try:
        cdc = bench_cdc(spark, workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    total = round(sum(times.values()) + cdc["cdc_apply_sec"], 3)
    out = {
        "metric": "headline_queries_plus_cdc_apply",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": int(cpus),
        "cpu_probe_ns_per_iter": cpu_probe(),
        **cdc,
    }
    spark.stop()

    # same-session prior-round-code baseline (skippable with
    # BENCH_NO_BASELINE=1): absolute seconds from different host
    # windows are NOT comparable on this VM (round-4 lesson — a
    # code-identical query drew 1.6-2.1x slower across rounds), and the
    # FIRST draw of a session is itself anomalously slow (measured ~1.8x
    # on back-to-back identical code), so the round-over-round ratio is
    # computed from two WARM subprocess draws: current code first,
    # baseline code second — the baseline gets the warmest slot, so
    # any residual order bias makes the ratio read WORSE for the
    # current code, never better. The primary value above remains the
    # in-process draw, same protocol as every previous round.
    # the A/B triples total wall-clock; if the primary draw alone blew
    # past the budget (big SF, loaded host), skip it rather than risk a
    # harness timeout — the primary metrics always come first
    primary_sec = time.perf_counter() - t_main0
    ab_budget = float(os.environ.get("BENCH_AB_BUDGET_SEC", "900"))
    if not os.environ.get("BENCH_NO_BASELINE") and primary_sec <= ab_budget:
        rev = _baseline_rev()
        if rev:
            repo = os.path.dirname(os.path.abspath(__file__))
            # per-metric single draws of 1-3s measurements swing up to
            # 3x draw-to-draw on this host (measured both directions in
            # one session), so each side contributes TWO draws and the
            # ratio compares per-metric minima. Current side = the cold
            # in-process draw above + one warm subprocess draw;
            # baseline side = two warm subprocess draws in the warmest
            # slots — residual order bias still reads AGAINST the
            # current code.
            cur2 = _run_bench_subprocess(repo)
            bases = [run_baseline(rev), run_baseline(rev)]
            bases = [b for b in bases if b]
            if cur2 and bases:
                cur_draws = [out, cur2]

                def best(draws, key, sub=None):
                    vals = []
                    for d in draws:
                        v = (d.get(sub, {}) if sub else d).get(key)
                        if v:
                            vals.append(v)
                    return min(vals) if vals else None

                out["baseline_rev"] = rev[:12]
                out["baseline_protocol"] = (
                    "best-of-2 per side (current: in-process + 1 warm "
                    "subprocess; baseline: 2 warm subprocess draws in "
                    "the warmest slots); ratio = min(current)/min(baseline)"
                )
                out["baseline_value"] = best(bases, "value")
                out["self_warm_value"] = cur2.get("value")
                qr = {}
                for k in out.get("queries", {}):
                    c = best(cur_draws, k, sub="queries")
                    b = best(bases, k, sub="queries")
                    if c and b:
                        qr[k] = round(c / b, 3)
                out["queries_ratio_vs_prev"] = qr
                cr = {}
                for k in (
                    "cdc_apply_sec", "cdc_mor_apply_sec",
                    "cdc_incr_apply_sec", "cdc_incr_mor_apply_sec",
                    "cdc_incr_zx_apply_sec", "cdc_incr_pt_apply_sec",
                ):
                    c, b = best(cur_draws, k), best(bases, k)
                    if c and b:
                        cr[k] = round(c / b, 3)
                out["cdc_ratio_vs_prev"] = cr
                cv, bv = best(cur_draws, "value"), best(bases, "value")
                if cv and bv:
                    out["value_ratio_vs_prev"] = round(cv / bv, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
