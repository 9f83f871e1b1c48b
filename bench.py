#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line on stdout.

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], plus the engine's flagship end-to-end
validation over a deterministically synthesized interleaved-spans
documents table (seed 42). Everything else (logs) goes to stderr.

Output:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>,
   "docs_per_sec": <validation throughput>}
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


_BURN = """
import sys, time, multiprocessing as mp
k = int(sys.argv[1])
def burn(n):
    x = 0
    for i in range(10_000_000):
        x += i
    return x
if __name__ == "__main__":
    t0 = time.perf_counter()
    with mp.Pool(k) as pool:
        pool.map(burn, range(k))
    print(k / (time.perf_counter() - t0))
"""


def host_probe(cores: int) -> float:
    """Pure-CPU multiprocess throughput (units/s) the shared VM
    delivers RIGHT NOW — the same probe BENCH/run_scaling.py uses,
    shortened to ~1s. Interleaved with the e2e trials so a noisy
    headline sample can be attributed to the host, not the engine
    (round-4 review: a lone e2e sample on a +-2x VM invites a false
    regression verdict every round)."""
    import subprocess

    out = subprocess.run(
        [sys.executable, "-c", _BURN, str(cores)],
        check=True, capture_output=True, text=True,
    )
    return float(out.stdout.strip())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "1000000"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    from automatic_data_validator_spark.introspect import (
        input_records as _input_records,
    )
    from automatic_data_validator_spark.session import get_spark
    from automatic_data_validator_spark.synth import make_documents, make_media_catalog
    from automatic_data_validator_spark.validate import run_validation
    import __spark_entry__ as entrymod

    spark = get_spark("advs-bench", parallelism=cpus, shuffle_partitions=cpus * 2)
    timings: dict[str, float] = {}

    # --- operator micro-benchmarks over the TPC-H-ish tables ---------------
    headline = [
        "q01_pricing_summary",   # fused agg scan
        "q05_quantiles",         # approx/exact percentile
        "q12_corr_matrix",       # multi-corr single pass
        "q20_window_topk_orders",  # window
        "q23_unique_key_violations",  # two-phase salted dedup shuffle
        "q26_token_counts",      # regex token counting
        "q28_quality_flags",     # per-doc quality projection
        "q31_ann_cosine_topk",   # brute-force ANN
    ]
    qs = entrymod.queries()
    # untimed warm-up at the smallest available sibling SF (falls back
    # to sf_dir itself — a hardcoded path would silently skip warm-up
    # for any other data root and the timed runs would measure cold JIT)
    small = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    warm_dir = small if os.path.isdir(small) else sf_dir
    for name in headline:
        try:
            qs[name](spark, warm_dir).count()
        except Exception as e:  # pragma: no cover
            log(f"warmup {name} failed: {e}")
    for name in headline:
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        log(f"{name}: {dt:.3f}s ({n} rows)")

    # --- flagship: end-to-end validation on synthesized spans table --------
    # Materialize the synthetic input to parquet first (untimed): the
    # benchmark measures VALIDATION throughput over a stored table, the
    # production shape — not expression re-generation cost.
    import tempfile

    n_media = max(n_docs // 100, 1000)
    work = tempfile.mkdtemp(prefix="advs_bench_")
    make_documents(spark, n_docs, n_media=n_media, seed=42).write.mode(
        "overwrite"
    ).parquet(f"{work}/documents")
    make_media_catalog(spark, n_media, seed=42).write.mode("overwrite").parquet(
        f"{work}/media_catalog"
    )
    docs = spark.read.parquet(f"{work}/documents")
    catalog = spark.read.parquet(f"{work}/media_catalog")
    log(f"synth input materialized at {work}")

    # --- micro-benches run BEFORE the e2e job: its output writes evict
    # the input from page cache and made these bimodal (1.2s vs 6.5s)
    from automatic_data_validator_spark.spans import normalize_spans_arrow

    normalize_spans_arrow(docs.limit(5000)).count()  # warm-up
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        n = normalize_spans_arrow(docs).count()
        best = min(best, time.perf_counter() - t0)
    timings["normalize_1m"] = round(best, 3)
    log(f"normalize_1m: {best:.3f}s ({n} docs)")

    from pyspark.sql import functions as _F

    from automatic_data_validator_spark.dedup import minhash_signature

    txt = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_n = txt.count()
    big = txt
    if base_n > 0:
        # arithmetic doubling count — no count() inside the loop (each
        # one would rescan the growing union), no hang on empty input
        import math

        for _ in range(max(0, math.ceil(math.log2(160_000 / base_n)))
                       if base_n < 160_000 else 0):
            big = big.unionByName(big)
    big = big.cache()
    n_txt = big.count()
    probe = _F.sum(_F.pmod(_F.element_at(minhash_signature("text"), 1), _F.lit(997)))
    big.limit(2000).select(probe).collect()  # warm-up
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        big.select(probe).collect()
        best = min(best, time.perf_counter() - t0)
    timings["minhash_sig_160k"] = round(best, 3)
    log(f"minhash_sig_160k: {best:.3f}s ({n_txt} texts)")
    big.unpersist()

    # --- composed near-dup pipeline e2e (round-4 VERDICT directive #6):
    # LSH candidates -> jaccard verify -> connected components ->
    # anti-join, on a 160k-doc corpus with PLANTED ground truth (8k
    # consecutive near-dup pairs at jaccard ~0.9, everything else
    # jaccard 0) so the timing doubles as a recall/exactness gate.
    from automatic_data_validator_spark.dedup import neardup_dedup
    from automatic_data_validator_spark.synth import make_neardup_corpus

    n_dd, n_pair_docs = 160_000, 16_000
    make_neardup_corpus(spark, n_dd, n_pair_docs, seed=7).write.mode(
        "overwrite"
    ).parquet(f"{work}/dedup_corpus")
    ddf = spark.read.parquet(f"{work}/dedup_corpus")
    # untimed 1/32-scale warm-up: the FIRST Arrow-UDF invocation pays
    # Python-worker spawn + numpy import (~10s measured) — startup
    # cost, not pipeline cost
    make_neardup_corpus(spark, 5_000, 500, seed=8).write.mode(
        "overwrite"
    ).parquet(f"{work}/dedup_warm")
    for f in neardup_dedup(spark.read.parquet(f"{work}/dedup_warm")):
        f.count()
    # best-of-2 (same policy as normalize_1m/minhash: a lone sample
    # this early in the session measures page-cache + JIT warmth, not
    # the pipeline — 92s vs 24s observed for identical work)
    best = float("inf")
    for _ in range(2):
        rec0 = _input_records(spark)
        t0 = time.perf_counter()
        kept, drop, pairs, _oversize = neardup_dedup(ddf)
        n_kept, n_drop, n_pairs = kept.count(), drop.count(), pairs.count()
        best = min(best, time.perf_counter() - t0)
    dt = best
    timings["dedup_e2e_160k"] = round(dt, 3)
    dd_scans = (_input_records(spark) - rec0) / n_dd
    dedup_error = None
    # planted ground truth: exactly n_pair_docs/2 verified pairs, one
    # drop per pair — a recall or component regression fails the gate.
    # One-pass signature property (status-store scan counter): the
    # corpus is read ~4x end-to-end (sign, verify text fetch, kept
    # anti-join, + partial side reads); a SECOND signature pass — the
    # regression the banded persist exists to prevent — adds a full
    # extra corpus scan and trips the 5x bound. Recorded as a visible
    # JSON error rather than a crash so one tripped gate cannot cost
    # the round its whole BENCH file.
    if (n_pairs, n_drop, n_kept) != (
        n_pair_docs // 2, n_pair_docs // 2, n_dd - n_pair_docs // 2,
    ):
        dedup_error = (
            f"planted-truth mismatch: pairs={n_pairs} drop={n_drop} "
            f"kept={n_kept} (want {n_pair_docs // 2}/"
            f"{n_pair_docs // 2}/{n_dd - n_pair_docs // 2})"
        )
    elif dd_scans >= 5.0:
        dedup_error = (
            f"corpus scanned {dd_scans:.2f}x (>=5) — signature pass re-ran?"
        )
    if dedup_error:
        log(f"dedup_e2e_160k GATE FAILED: {dedup_error}")
    else:
        log(
            f"dedup_e2e_160k: {dt:.3f}s ({n_pairs} pairs verified, "
            f"{n_drop} dropped, corpus scanned {dd_scans:.2f}x)"
        )

    # untimed warm-up on a 20x smaller table: JIT + codegen for the
    # validation plans out of the timed region (same policy as the
    # headline-query warm-up above)
    make_documents(spark, max(n_docs // 20, 1000), n_media=n_media, seed=43).write.mode(
        "overwrite"
    ).parquet(f"{work}/documents_warm")
    warm = run_validation(
        spark, spark.read.parquet(f"{work}/documents_warm"), catalog=catalog
    )
    warm.violations.write.mode("overwrite").parquet(f"{work}/out_warm/violations")
    warm.verdicts.write.mode("overwrite").parquet(f"{work}/out_warm/verdicts")
    warm.metrics.write.mode("overwrite").parquet(f"{work}/out_warm/metrics")
    from automatic_data_validator_spark.sources import write_outputs_parallel

    # best-of-3 with a host probe interleaved per trial: a single
    # sample is hostage to the shared VM's 2x throughput swings
    # (BENCH/BASELINE.md notes), and without the probe a slow sample
    # is indistinguishable from an engine regression
    trials: list[tuple[float, float]] = []
    for i in range(3):
        hb = host_probe(cpus)
        t0 = time.perf_counter()
        res = run_validation(spark, docs, catalog=catalog, with_profile=True)
        # production sink: write all outputs (each violation plan runs once)
        write_outputs_parallel(
            {"violations": res.violations, "verdicts": res.verdicts,
             "metrics": res.metrics},
            f"{work}/out",
        )
        t = time.perf_counter() - t0
        trials.append((t, hb))
        log(f"e2e trial {i}: {t:.3f}s (host probe {hb:.2f} u/s)")
    dt, probe_at_best = min(trials)
    n_viol = spark.read.parquet(f"{work}/out/violations").count()
    timings["validate_e2e"] = round(dt, 3)
    docs_per_sec = round(n_docs / dt, 1)
    # host-independent figure for cross-round comparison: docs/s per
    # probe unit/s — cancels the VM's throughput-of-the-day
    dps_per_probe = round(docs_per_sec / probe_at_best, 2)
    log(f"validate_e2e: {dt:.3f}s on {n_docs} docs -> {docs_per_sec} docs/s "
        f"({n_viol} violation rows, best of 3; "
        f"{dps_per_probe} docs/s per probe-unit)")

    # --- incremental mode: a 5% delta against persisted state ----------
    # Wall seconds only, for transparency: at sandbox scale the
    # increment's time is dominated by fixed job-scheduling overhead
    # (~15 small jobs for stores/merges), NOT the design — the scale
    # claim is about scan volume, and that is pinned precisely by
    # tests/test_incremental.py::test_incremental_reads_delta_not_corpus
    # (increment input records <= a few delta passes + one narrow
    # key-index pass; a corpus re-scan would cost 4x corpus on top).
    # Separate JSON fields — the headline `value` stays comparable.
    from automatic_data_validator_spark.incremental import validate_incremental

    validate_incremental(  # untimed bootstrap over the same corpus
        spark, f"{work}/documents", f"{work}/inc_state", catalog=catalog
    )
    delta_docs = max(n_docs // 20, 1000)
    # fresh id space: make_documents re-uses doc-%012d from 0, which
    # would make EVERY delta key collide with the corpus — that would
    # time a pathological all-duplicate increment, not a realistic
    # append (round-5 review finding)
    from pyspark.sql import functions as _F2

    make_documents(spark, delta_docs, n_media=n_media, seed=99).withColumn(
        "doc_id", _F2.concat(_F2.lit("inc1-"), _F2.col("doc_id"))
    ).write.mode("append").parquet(f"{work}/documents")
    t0 = time.perf_counter()
    ires = validate_incremental(
        spark, f"{work}/documents", f"{work}/inc_state", catalog=catalog
    )
    inc_dt = time.perf_counter() - t0
    assert ires.delta_rows == delta_docs
    log(
        f"incremental: {inc_dt:.3f}s for a {delta_docs}-doc delta "
        f"(fixed-overhead-bound at this scale; see scan-budget test)"
    )

    # untimed: the run-level rollup the reference prints per session
    # (state.run_summary; round-3 VERDICT directive #4)
    from automatic_data_validator_spark.state import run_summary

    tot = next(
        r for r in run_summary(res.lineage, res.verdicts).collect()
        if r["phase"] == "__run__"
    )
    log(
        f"run summary: phases_duration_s={tot['duration_s']} "
        f"wall_s={tot['wall_s']} "
        f"checked_rows={tot['row_count']} violations={tot['violation_count']} "
        f"pass_rate={tot['pass_rate']}"
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_e2e_validation",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "docs_per_sec": docs_per_sec,
                "host_probe_units_per_sec": round(probe_at_best, 2),
                "docs_per_sec_per_probe_unit": dps_per_probe,
                "e2e_trials_sec": [round(t, 3) for t, _ in trials],
                "incremental_delta_sec": round(inc_dt, 3),
                "incremental_delta_docs": delta_docs,
                "dedup_corpus_scans": round(dd_scans, 2),
                **({"dedup_e2e_error": dedup_error} if dedup_error else {}),
                "n_docs": n_docs,
                "cpus": cpus,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
