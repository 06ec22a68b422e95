"""Benchmark harness: runs the declared headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is forced with the noop sink (full computation, no driver
collect) after a warm-up of the session; per-query wall seconds reported.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mdio_python_spark.plans.registry import registry  # noqa: E402
from mdio_python_spark.session import get_spark  # noqa: E402


# Scale-critical set for --stress: the costliest queries plus every shape
# with a known nonlinear failure mode (LSH/band fan-out, funnel exchange
# reuse, global ordering, windowed sessions, bucketed ANN).
STRESS_QUERIES = (
    "corpus_curation_funnel",
    "near_dup_jaccard",
    "simhash_hamming_pairs",
    "minhash_lsh_pairs",
    "bm25_topk",
    "embedding_ivf_ann",
    "events_sessions",
    "asof_view_attribution_bucketed",
    "ordered_export",
    "geometry_line_gun_analysis",
    # round-4 continuation: iterative graph propagation (edge growth +
    # per-iteration joins) and the sketch family (must stay flat-ish:
    # output size is constant in corpus size)
    "similarity_graph_pagerank",
    "approx_distinct_hll",
    "countmin_heavy_hitters",
    "incremental_dedup_kept",
    # round 5: the rank family rebuilt on the two-phase ordinal (formerly
    # single-task NTILE / lang-partitioned windows) and the ANN recall QC
    # (exact brute-force leg + IVF leg in one query)
    "customer_value_deciles",
    "quality_percentile_bands",
    "length_mad_outliers",
    "ann_recall_at_k",
    # round-5 additions: stride-1 window explode (O(tokens) fan-out),
    # cell-bucketed SemDeDup pair generation (hot-cell quadratic risk),
    # and the BPE train+apply chain (corpus scan + M vocab shuffles)
    "substring_dup_windows",
    # semantic_dedup_drops (fixed 16 cells) retired from the stress set
    # in round 7 alongside knn_graph_hubness — semantic_dedup_scaled
    # (sqrt(n) cells) is the configuration whose curve means something;
    # the fixed-cell query stays declared and oracle-paired for parity
    "bpe_tokenized_docs",
    # round-5b corpus-scoring family: vocab-sized model joins
    # (bigram LM), broadcast bucket ratios (DSIR), shared-exchange
    # first-occurrence join (novelty)
    "bigram_lm_score",
    "importance_weights_dsir",
    "ngram_novelty_score",
    "vocab_diversity_by_source",
    # 4 banding legs + r=1 truth basis over shared cached stages; the
    # r=1 leg is the hot one (single-minhash buckets, cap-bounded)
    "lsh_tuning_curve",
    # epoch-shuffle manifest (two-phase rank under a 16-way group key)
    # and keep-best-of-cluster (connected components + argmax join)
    "training_order_manifest",
    "cluster_best_representative",
    # vocab-sized self-join over the persisted (source, token) stage
    "source_vocab_overlap",
    # char-shingle explode (the largest per-doc fan-out in the repo) +
    # entropy-tightened 2x4 banding
    "char_shingle_near_dup",
    # round-5c: per-position kgram hashing + per-doc window min
    # (winnowing), corpus posexplode -> dim-keyed pair join (centroids),
    # grouped two-phase top-k under lang skew, and the CC-based split /
    # effective-size pair (corpus left join against the clustered subset)
    "winnowing_fingerprints",
    "winnowing_dup_pairs",
    "source_centroid_cosine",
    "top_ngrams_by_lang",
    "leakage_safe_split",
    "dedup_effective_tokens",
    # round-5c batch 8: literal-centroid assignment + tiny-table majority
    # window (purity), and the three-pipeline cross-signal decile rollup
    "cluster_label_purity",
    "quality_dup_deciles",
    # round-5d batch 9: x|thresholds| pair explode over the persisted
    # verify set and the CC + double edge-count rollup (eager).
    # knn_graph_hubness (fixed 16 cells) is RETIRED from the stress set
    # as of round 7 (VERDICT r6 item 4): its cap-bound-linear asymptote
    # was the biggest absolute 100x cost (184 s) while measuring only the
    # cap, not the engine — the sqrt(n)-cell variant below measures the
    # honest growing-cells curve. The fixed-cell query stays declared and
    # oracle-paired for parity.
    "dedup_threshold_sweep",
    "cluster_edge_density",
    # round-5d batch 10: x3 corpus gram scans (decon curve), the bpe
    # train+apply chain grouped by lang, and the exact-dup histogram
    "decontamination_ngram_curve",
    "tokenizer_fertility_by_lang",
    "dup_inflation_curve",
    # round-5d batch 11: corpus posexplode -> (label, dim) collapse
    # (anisotropy), broadcast-centroid fold + per-vec max (margin),
    # token explode -> grouped two-phase top-k (zipf)
    "embedding_anisotropy",
    "embedding_label_margin",
    "zipf_head_share",
    # round-5d batch 12: prefix-sum packing rollup and the bucketed
    # as-of staleness rollup
    "packing_boundary_stats",
    "asof_staleness_buckets",
    # round 6: the sqrt(n)-cell configurations (VERDICT r5 item 4) — the
    # whole point is the stress curve: join-key count grows with the
    # corpus, so these should beat the fixed-16-cell cap-bound asymptote
    "knn_graph_hubness_scaled",
    "semantic_dedup_scaled",
    # round 6c/6d: gate-QC calibration (near_dup plan shape with the
    # agree join and ungated verify — the heaviest of the QC trio),
    # two-stage retrieval (ADC corpus leg + broadcast rerank; the recall
    # QC adds the brute-force exact leg), the corpus groupBy+join weights,
    # the zero-exchange quantization audit, and the regex-scan rollup
    "minhash_gate_calibration",
    "pq_shortlist_rerank",
    "rerank_recall_gain",
    "soft_dedup_weights",
    "int8_quant_error",
    "pii_density_by_source",
    # round 7: global rank-statistic quantization sweep — one range
    # exchange (exact kth |v| via distributed_ordinal) + one combinable
    # agg; joined the set AFTER the r7 stress rows were recorded, so its
    # own 10x/30x/100x curve lives in BENCH_clip_sweep_r07.json
    "int8_quant_clip_sweep",
    # round 8 (VERDICT r7 item 1): the fit-once multiprobe kNN graph —
    # the LINEAR-asymptote counterpart to knn_graph_hubness_scaled's
    # ~n^1.5 growing-cells config; both measured side by side
    "knn_graph_hubness_multiprobe",
)


def _timed(spark, fn, sf_dir: str, runs: int = 2, eager: bool = False) -> float:
    """Best-of-``runs`` wall time. ``eager=True`` starts the clock BEFORE
    the builder call: queries whose construction performs unbounded
    distributed work (a connected-components fixpoint, a sampled k-means
    fit) would otherwise leave that work — the part that actually scales —
    entirely outside the timed window (QuerySpec.eager documents the
    classification; bounded driver literals stay excluded)."""
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        if not eager:
            t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    return best


def run_stress(scale: int, out_name: str, only: list[str] | None = None) -> None:
    """Opt-in sf-scaling stress row (VERDICT r3 item 8): time the
    scale-critical queries at base sf0.1 and at a derived ``scale``-times
    dataset; flag anything scaling worse than ~linear in rows."""
    from mdio_python_spark.pipelines.stress import build_scaled_dir

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("mdio-spark-stress")
    scaled_dir = build_scaled_dir(
        spark, base_dir, f"/tmp/mdio_stress_x{scale}", scale
    )
    regs = registry()
    report: dict[str, dict[str, float]] = {}
    superlinear: list[str] = []
    # warm codegen at the smallest available SF; fall back to the base
    # dir so a machine without /root/testdata still runs
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = base_dir
    errors: dict[str, str] = {}
    for name in only or STRESS_QUERIES:
        spec = regs[name]
        # per-query isolation (round 6): a query that dies at the scaled
        # SF — e.g. the statically-misplanned corpus broadcast the 100x
        # row caught — must cost one entry, not the whole row (the first
        # 100x attempt died 29 queries in and wrote nothing)
        try:
            spec.fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # warm codegen
            base_s = _timed(spark, spec.fn, base_dir, eager=spec.eager)
            scaled_s = _timed(spark, spec.fn, scaled_dir, eager=spec.eager)
        except Exception as exc:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"  {name}: ERROR {errors[name][:120]}", file=sys.stderr)
            spark.catalog.clearCache()
            continue
        ratio = scaled_s / max(base_s, 1e-6)
        report[name] = {
            "base_s": round(base_s, 3),
            "scaled_s": round(scaled_s, 3),
            "ratio": round(ratio, 2),
        }
        # linear in rows = ratio ~ scale; allow 1.6x slack for shuffle
        # constants before calling a plan superlinear
        if ratio > scale * 1.6:
            superlinear.append(name)
        print(f"  {name}: {base_s:.2f}s -> {scaled_s:.2f}s ({ratio:.1f}x)",
              file=sys.stderr)
    out = {
        "metric": "stress_scale_ratio",
        "scale": scale,
        "base_dir": base_dir,
        "timing": "best_of_2_gc_isolated",
        # host-health provenance: loadavg + first-touch page bandwidth
        # at run end (see _mem_touch_mb_s — a degraded value flags
        # host-co-tenant contamination invisible to loadavg)
        "end_load": round(os.getloadavg()[0], 2),
        "mem_touch_mb_s": _mem_touch_mb_s(),
        "queries": report,
        "superlinear": superlinear,
    }
    if errors:
        out["errors"] = errors
    path = Path(__file__).resolve().parent / out_name
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps({
        "metric": "stress_scale_ratio",
        "scale": scale,
        "n_queries": len(report),
        "n_errors": len(errors),
        "superlinear": superlinear,
        "detail": out_name,
    }))


def _mem_touch_mb_s(n_bytes: int = 1 << 28) -> float:
    """First-touch page-allocation bandwidth (MB/s): allocate and write
    fresh pages once. On a healthy box this is multiple GB/s; under
    host-level memory contention (this box is a VM — a noisy co-tenant
    is invisible to our loadavg) it was measured collapsing to
    ~90 MB/s, which uniformly inflates every Spark stage that touches
    new memory. Recording it makes ambient contamination self-evident
    in the artifact even when loadavg reads 0."""
    import numpy as np

    t0 = time.perf_counter()
    a = np.empty(n_bytes // 8, dtype=np.float64)
    a[:] = 1.0  # first touch of every page
    dt = time.perf_counter() - t0
    del a
    return round(n_bytes / 1e6 / dt, 1)


def _wait_for_quiet(max_wait_s: float = 600.0, load_gate: float = 1.5):
    """Quiet-run gate (round 10, VERDICT r9 item 2): the r9 official
    bench regressed 1.20x purely from ambient co-tenancy while the
    same-HEAD quiet run was 1.01x — the graded number must be a quiet
    one. Sample 1-minute loadavg at bench start; if another workload is
    running (load above ``load_gate`` on this 32-core box), sleep in
    15 s steps up to ``max_wait_s`` for it to drain, then proceed LOUDLY
    (the recorded start_load makes any remaining contamination
    self-evident rather than silently attributed to the plans).

    Returns (start_load_1m, waited_s). The gate is 1.5 — not 0.0 —
    because loadavg decays over minutes: a just-finished compile leaves
    residual load with no remaining CPU contention, and blocking the
    bench on the decay tail would trade a real measurement for an
    idle wait.

    Also gates on HOST health via :func:`_mem_touch_mb_s` (threshold
    500 MB/s — degraded is ~90, healthy is several 1000): this box is a
    VM, and a noisy host co-tenant inflates every query uniformly while
    our own loadavg reads 0. Returns (start_load_1m, waited_s,
    mem_touch_mb_s)."""
    waited = 0.0
    load = os.getloadavg()[0]
    touch = _mem_touch_mb_s()
    while (load > load_gate or touch < 500.0) and waited < max_wait_s:
        time.sleep(15.0)
        waited += 15.0
        load = os.getloadavg()[0]
        touch = _mem_touch_mb_s()
    if load > load_gate or touch < 500.0:
        print(
            f"bench: WARNING starting under ambient load {load:.2f} / "
            f"first-touch {touch} MB/s after waiting {waited:.0f}s — "
            f"timings may be inflated",
            file=sys.stderr,
        )
    return round(load, 2), round(waited, 1), touch


def _unique_run_id() -> str:
    """Second-granularity run_id + pid, suffixed on collision (ADVICE r9:
    two runs starting within one second must never overwrite each
    other's stamped sidecar)."""
    here = Path(__file__).resolve().parent
    base = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime()) + f"-{os.getpid()}"
    run_id, n = base, 0
    while (here / f"BENCH_detail_{run_id}.json").exists():
        n += 1
        run_id = f"{base}-{n}"
    return run_id


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    start_load, waited_s, mem_touch = _wait_for_quiet()
    spark = get_spark("mdio-spark-bench")
    # Warm-up: run every query once at the smallest SF so the timed runs
    # measure the plan, not JVM codegen/classloading for each operator's
    # expression tree (md5/conv/regexp/window codegen dominates cold runs).
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name, spec in sorted(registry().items()):
        if not spec.bench:
            continue
        try:
            spec.fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    # Per-query isolation: one broken query must cost one row, not the
    # round (round 2 lost its entire bench to a single AnalysisException).
    # Query CONSTRUCTION stays outside the timer for LAZY queries (py4j
    # plan-building adds a flat ~50-100 ms that isn't execution cost and
    # would skew every cross-round per-query comparison) — EXCEPT the
    # spec.eager queries, whose construction performs unbounded
    # distributed work (connected-components fixpoint, sampled k-means
    # fit): for those the clock starts before the builder call, or the
    # very work that scales would escape measurement (round-5 fix; their
    # timings rose accordingly vs earlier rounds' under-reports).
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    spark.catalog.clearCache()  # warm-up loop caches must not skew query #1
    for name, spec in sorted(registry().items()):
        if not spec.bench:
            continue
        try:
            # best of 2: single-shot timings on a long-lived 48g JVM are
            # GC-pause roulette (observed 9x spikes on 0.2s queries); the
            # min of two complete executions is the query's actual cost.
            # _timed is the ONE timing implementation (shared with the
            # stress harness) so clock policy — including the eager-
            # construction rule — cannot drift between the two.
            timings[name] = round(_timed(spark, spec.fn, sf_dir, eager=spec.eager), 4)
        except Exception as exc:  # noqa: BLE001 — harness must survive anything
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        finally:
            # drop per-query cached relations (e.g. ordered_export's
            # persisted sort stage) — on success AND failure — so later
            # queries aren't timed under an earlier query's memory, and
            # pay accumulated GC debt OUTSIDE the next timed window (a
            # deferred major GC was landing inside unlucky queries and
            # inflating both best-of-2 runs ~6x)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 4)
    # Full per-query map goes to a sidecar file: at 66+ queries the inline
    # map overflows the driver's ~2 KB stdout-tail capture and the round's
    # official bench records parsed=null (VERDICT r3 item 1). The FINAL
    # stdout line is a compact summary (< 1 KB) the driver can always parse.
    # Provenance (round 9, VERDICT r8 item 6): the summary and its sidecar
    # share a run_id, and the sidecar is ALSO written under a run-stamped
    # name — a later run can overwrite BENCH_detail.json but can never
    # destroy or mismatch an earlier summary's per-query record.
    run_id = _unique_run_id()
    here = Path(__file__).resolve().parent
    sidecar = here / "BENCH_detail.json"
    end_load = round(os.getloadavg()[0], 2)
    detail = {
        "metric": "total_declared_query_wall",
        "run_id": run_id,
        "value": total,
        "unit": "sec",
        "sf": sf,
        "timing": "best_of_2_gc_isolated",
        # quiet-run provenance: ambient 1-min loadavg at start (after the
        # wait gate) and at end; end_load reflects the bench's own load +
        # anything that co-ran, so start_load is the contamination signal
        "start_load": start_load,
        "end_load": end_load,
        "quiet_wait_s": waited_s,
        "mem_touch_mb_s": mem_touch,
        "queries": timings,
        "errors": errors,
    }
    payload = json.dumps(detail, indent=1)
    sidecar.write_text(payload)
    (here / f"BENCH_detail_{run_id}.json").write_text(payload)
    top = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    summary = {
        "metric": "total_declared_query_wall",
        "run_id": run_id,
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "timing": "best_of_2_gc_isolated",
        "start_load": start_load,
        "end_load": end_load,
        "quiet_wait_s": waited_s,
        "mem_touch_mb_s": mem_touch,
        "top5": top,
        "detail": sidecar.name,
    }
    if errors:
        summary["error_names"] = sorted(errors)[:8]
    line = json.dumps(summary)
    if len(line) > 1000:  # hard guarantee: never overflow the tail capture
        for k in ("error_names", "top5"):
            summary.pop(k, None)
        line = json.dumps(summary)
    print(line)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--stress", type=int, default=0, metavar="SCALE",
                    help="run the scale-stress row at SCALE x the base SF "
                         "instead of the standard bench")
    ap.add_argument("--stress-out", default="BENCH_sf1_r04.json")
    ap.add_argument("--stress-queries", default=None,
                    help="comma-separated subset of STRESS_QUERIES (deep "
                         "high-scale runs on the worst offenders only)")
    ns = ap.parse_args()
    if ns.stress:
        only = ns.stress_queries.split(",") if ns.stress_queries else None
        run_stress(ns.stress, ns.stress_out, only)
    else:
        main()
