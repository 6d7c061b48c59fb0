"""Benchmark driver.

Headline: CDC replay throughput — synthetic oplog-shaped change events
(scaled by the sf directory) generated in parallel, replayed through
the full engine (normalize → partial LWW → bucket shuffle → actor-pool
merge-appliers → committed COW Parquet snapshot under /tmp). Metric:
events/sec; the BASELINE.json target currency.

Also times the flagship driver queries at the same sf.

Noise handling: the measured section repeats GRAFT_BENCH_REPEATS times
(default 3) inside one Ray session after a shared warm-up; every
reported number is the per-metric MEDIAN and the JSON carries min/max
dispersion per query, so a single artifact distinguishes a real
regression from machine swing (this box swings ±3× run-to-run —
BASELINE.md's round-3 interleaved A/B).

Usage:
    python bench.py               # one JSON line on stdout
    python bench.py --scaling     # same job at num_cpus=8 and =32 in
                                  # fresh processes; prints both
                                  # throughputs + scaling efficiency

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32), GRAFT_BENCH_REPEATS (default 3).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_ROOT = "/tmp/kcm_bench"
SCALING_ARTIFACT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "SCALING.json")


def _reservation_ratio():
    """GRAFT_RESERVATION selects the regime: the measured-best default
    (0.3) or "off" (plain regime — reservation disabled; the honest
    non-super-linear scaling comparison, BASELINE.md round-4 finding:
    the 8-CPU leg idles under the executor's reservation, inflating
    8→32 ratios past 1.0)."""
    v = os.environ.get("GRAFT_RESERVATION", "0.3")
    return v if v in ("off", "auto") else float(v)


def _docs_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def _gen_spec(sf_dir: str, ncpu: int):
    """Event volume scales with the sf directory: ~400 events per
    documents row (sf0.1 → 2M events over 20k keys). The spec is
    INDEPENDENT of ncpu — the scaling criterion requires the identical
    job/input at both parallelism levels."""
    from kafka_connect_mongo_ray.sources.gen import GenSpec

    rows = _docs_rows(sf_dir)
    num_partitions = 64
    mult = int(os.environ.get("GRAFT_BENCH_MULT", "1"))
    total_events = rows * 400 * mult
    return GenSpec(
        num_partitions=num_partitions,
        events_per_partition=max(1000, total_events // num_partitions),
        seed=42,
        skew=2.0,
        dup_frac=0.02,
        content_words=30,
    )


def bench_cdc_replay(sf_dir: str, ncpu: int) -> dict:
    import ray

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay
    from kafka_connect_mongo_ray.sources.gen import change_event_dataset, synth_repo_files

    spec = _gen_spec(sf_dir, ncpu)
    n_keys_target = _docs_rows(sf_dir) * 4
    paths_per_repo = 100
    base = synth_repo_files(max(1, n_keys_target // paths_per_repo), paths_per_repo, seed=42)

    shutil.rmtree(BENCH_ROOT, ignore_errors=True)
    cfg = EngineConfig(
        snapshot_dir=f"{BENCH_ROOT}/snapshot",
        checkpoint_dir=f"{BENCH_ROOT}/checkpoints",
        num_buckets=64,  # fixed: identical job shape at every parallelism level
        apply_mode="tasks",
        # default (pull-based sort) exchange: the round-4 HASH_SHUFFLE
        # switch rested on an A/B inverted by creation-time context
        # binding; the corrected ABBA A/B has default winning at both
        # 2M and 50M events (BASELINE.md "Shuffle strategy, corrected")
        prereduce_coalesce=32,
        op_reservation_ratio=_reservation_ratio(),
    )
    events = change_event_dataset(spec, base, concurrency=min(ncpu, spec.num_partitions))
    total_events = spec.num_partitions * spec.events_per_partition
    t0 = time.perf_counter()
    summary = run_replay(events, cfg)
    dt = time.perf_counter() - t0

    # incremental tail apply: 5% new events (strictly later ts) onto the
    # committed snapshot — COW carry-forward + checkpoint-token resume
    import dataclasses

    delta_spec = dataclasses.replace(
        spec,
        events_per_partition=max(100, spec.events_per_partition // 20),
        seed=spec.seed + 1,
        base_ts=spec.base_ts + spec.events_per_partition * spec.num_partitions * 2,
    )
    delta_events = change_event_dataset(delta_spec, base)
    delta_n = delta_spec.num_partitions * delta_spec.events_per_partition
    t1 = time.perf_counter()
    run_replay(delta_events, cfg)
    dt_inc = time.perf_counter() - t1
    return {
        "sec": dt,
        "events": total_events,
        "events_per_sec": total_events / dt,
        "live_rows": summary["live_rows"],
        "incremental_sec": dt_inc,
        "incremental_events": delta_n,
    }


def bench_analyzed(sf_dir: str, ncpu: int, dirt_every: int = 0) -> dict:
    """Analyzed-schema mode: events carry the row image as a JSON text
    column (the reference's ``object`` field); the AnalyzeObjectStage
    actor pool parses + lattice-coerces + schema-evolves every record
    before the normal replay. The Python-parse-bound mode.

    ``dirt_every`` > 0 makes every N-th row's JSON malformed — the
    lightly-dirty regime the split-retry fast path targets (the clean
    run measures the pure Arrow path)."""
    import pandas as pd
    import pyarrow as pa

    import ray

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay
    from kafka_connect_mongo_ray.sources.gen import GenSpec, change_event_dataset, synth_repo_files

    rows = _docs_rows(sf_dir)
    mult = int(os.environ.get("GRAFT_AN_MULT", "1"))
    spec = GenSpec(num_partitions=32,
                   events_per_partition=max(1000, rows * 200 * mult // 32),
                   seed=7, content_words=5)
    base = synth_repo_files(max(1, rows // 25), 100, seed=7)

    def attach_json(batch: pa.Table) -> pa.Table:
        path = pd.Series(batch["path"].to_pylist())
        lang = pd.Series(batch["lang"].to_pylist())
        size = pd.Series(batch["ts"].to_pylist()).astype(str)
        obj = ('{"Name": "' + path + '", "size": ' + size
               + ', "language": "' + lang + '", "active": true}')
        if dirt_every:
            ts = pd.Series(batch["ts"].to_pylist())
            obj = obj.mask((ts % dirt_every) == 0, '{"Name": broken')
        return batch.append_column(
            "object", pa.array(obj.to_numpy(dtype=object), pa.large_string()))

    shutil.rmtree("/tmp/kcm_bench_an", ignore_errors=True)
    cfg = EngineConfig(snapshot_dir="/tmp/kcm_bench_an/s",
                       checkpoint_dir="/tmp/kcm_bench_an/c",
                       num_buckets=64, analyze_schema=True,
                       prereduce_coalesce=32,
                       op_reservation_ratio=_reservation_ratio())
    events = change_event_dataset(spec, base).map_batches(
        attach_json, batch_format="pyarrow")
    n = spec.num_partitions * spec.events_per_partition
    t0 = time.perf_counter()
    run_replay(events, cfg)
    dt = time.perf_counter() - t0
    return {"sec": dt, "events": n, "events_per_sec": n / dt}


def bench_queries(sf_dir: str) -> dict:
    from kafka_connect_mongo_ray.pipelines.queries import (
        q_ann_topk,
        q_cdc_final_state,
        q_cdc_lww_user_state,
        q_dedup_exact,
        q_docs_bm25,
        q_events_global_rank,
        q_events_rollup,
        q_text_stats,
        q_tpch_regional_revenue,
    )

    out = {}
    for name, fn in [
        ("cdc_final_state", q_cdc_final_state),
        ("cdc_lww_user_state", q_cdc_lww_user_state),
        ("dedup_exact", q_dedup_exact),
        ("ann_topk", q_ann_topk),
        ("text_stats", q_text_stats),
        ("docs_bm25", q_docs_bm25),
        ("events_rollup", q_events_rollup),
        ("events_global_rank", q_events_global_rank),
        # round-4 sixth session: 3-bucketed-join star (Q5 shape) — the
        # join-throughput data point
        ("tpch_regional_revenue", q_tpch_regional_revenue),
    ]:
        t0 = time.perf_counter()
        res = fn(sf_dir)
        # consume the dataset (count() fully executes the pipeline)
        import ray.data

        if isinstance(res, ray.data.Dataset):
            res.count()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def run_once() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NCPU,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    # warm the OS page cache so we measure compute + shuffle
    import pyarrow.parquet as pq

    for t in ("documents", "events", "embeddings"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    # warm the Ray worker pool (process spawn + library imports) with a
    # miniature replay so the timed run measures sustained throughput
    import shutil as _sh

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay
    from kafka_connect_mongo_ray.sources.gen import GenSpec, change_event_dataset, synth_repo_files

    _sh.rmtree("/tmp/kcm_warm", ignore_errors=True)
    warm_spec = GenSpec(num_partitions=NCPU, events_per_partition=2000, seed=1)
    warm_base = synth_repo_files(10, 50, seed=1)
    run_replay(
        change_event_dataset(warm_spec, warm_base),
        EngineConfig(snapshot_dir="/tmp/kcm_warm/s", checkpoint_dir="/tmp/kcm_warm/c",
                     num_buckets=NCPU),
    )

    headline_only = "--headline-only" in sys.argv
    analyzed_only = "--analyzed-only" in sys.argv
    if analyzed_only:
        # compute-bound scaling leg: ONLY the analyzed-mode replay
        # (JSON parse + lattice coercion dominates — the pipeline whose
        # single-node 8→32 scaling is not memory-bandwidth-confounded)
        an = bench_analyzed(SF_DIR, NCPU)
        ray.shutdown()
        return {"metric": "analyzed_events_per_sec",
                "value": round(an["events_per_sec"], 1),
                "unit": "events/sec", "events": an["events"],
                "sf": SF_DIR, "num_cpus": NCPU}
    repeats = max(1, int(os.environ.get("GRAFT_BENCH_REPEATS", "3")))
    if headline_only:
        repeats = 1  # scaling mode measures one identical job per process

    passes: list[dict] = []
    for _ in range(repeats):
        # drop cross-query result memos (near-dup pairs, ANN baseline):
        # a repeat must re-measure the distributed computation, not a
        # dict lookup
        from kafka_connect_mongo_ray.pipelines import queries as _q

        _q._NEAR_DUP_PAIR_CACHE.clear()
        _q._DEDUP_CC_CACHE.clear()
        _q._BRUTE_FORCE_CACHE.clear()
        _q._BM25_TF_CACHE.clear()

        replay = bench_cdc_replay(SF_DIR, NCPU)
        queries = {"cdc_replay": round(replay["sec"], 3),
                   "cdc_incremental": round(replay["incremental_sec"], 3)}
        analyzed = None
        if not headline_only:
            analyzed = bench_analyzed(SF_DIR, NCPU)
            queries["cdc_analyzed"] = round(analyzed["sec"], 3)
            # lightly-dirty regime (1 malformed row per 2048): exercises
            # the split-retry path instead of wholesale per-row fallback
            queries["cdc_analyzed_dirty"] = round(
                bench_analyzed(SF_DIR, NCPU, dirt_every=2048)["sec"], 3)
            queries.update(bench_queries(SF_DIR))
        passes.append({"replay": replay, "analyzed": analyzed,
                       "queries": queries})

    import statistics

    def med(vals):
        return statistics.median(vals)

    qnames = list(passes[0]["queries"])
    q_samples = {q: [p["queries"][q] for p in passes] for q in qnames}
    queries = {q: round(med(v), 3) for q, v in q_samples.items()}
    eps_samples = [p["replay"]["events_per_sec"] for p in passes]

    result = {
        "metric": "cdc_replay_events_per_sec",
        "value": round(med(eps_samples), 1),
        "unit": "events/sec",
        "headline_sec": queries["cdc_replay"],
        "events": passes[0]["replay"]["events"],
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "repeats": repeats,
    }
    if repeats > 1:
        result["value_min"] = round(min(eps_samples), 1)
        result["value_max"] = round(max(eps_samples), 1)
        result["dispersion"] = {
            q: {"min": round(min(v), 3), "max": round(max(v), 3)}
            for q, v in q_samples.items()}
    if passes[0]["analyzed"] is not None:
        an_eps = [p["analyzed"]["events_per_sec"] for p in passes]
        result["analyzed_events_per_sec"] = round(med(an_eps), 1)
        result["analyzed_events"] = passes[0]["analyzed"]["events"]
    # attach the most recent --scaling measurement (written by
    # run_scaling to SCALING.json) so the per-round bench artifact
    # carries both regimes' efficiencies alongside the throughput
    if not headline_only and os.path.exists(SCALING_ARTIFACT):
        with open(SCALING_ARTIFACT) as f:
            result["scaling"] = json.load(f)
    ray.shutdown()
    return result


def _scaling_one_regime(reservation: str, mode: str = "replay") -> dict:
    """One regime's N vs 4N measurement: identical job in fresh
    processes at num_cpus=8 and 32.

    ABBA ordering (8, 32, 32, 8) with per-level medians: the box's
    regime drifts run-over-run (measured 1.6× swings on the 32-CPU leg
    between adjacent runs — BASELINE.md), so a single 8-then-32 pair
    confounds the level with the position; alternating and taking the
    median of two runs per level cancels monotone drift, and the
    per-level min/max lands in the artifact as its own noise bound."""
    import statistics

    samples: dict[int, list[float]] = {8: [], 32: []}
    flag = "--analyzed-only" if mode == "analyzed" else "--headline-only"
    for ncpu in (8, 32, 32, 8):
        # 5x the workload for the scaling measurement: at the plain bench
        # size the 32-CPU run finishes in ~3 s and fixed costs (commit,
        # driver coordination) dominate, understating scalability
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR,
                   GRAFT_BENCH_MULT=os.environ.get("GRAFT_BENCH_MULT", "5"),
                   GRAFT_AN_MULT=os.environ.get("GRAFT_AN_MULT", "5"),
                   GRAFT_RESERVATION=reservation)
        proc = subprocess.run(
            [sys.executable, __file__, flag],
            env=env, capture_output=True, text=True, check=True,
        )
        val = json.loads(proc.stdout.strip().splitlines()[-1])["value"]
        samples[ncpu].append(val)
    tp8 = statistics.median(samples[8])
    tp32 = statistics.median(samples[32])
    eff = (tp32 / tp8) / 4.0
    return {
        "reservation": reservation,
        "mode": mode,
        "events_per_sec_8": tp8,
        "events_per_sec_32": tp32,
        "speedup": round(tp32 / tp8, 3),
        "scaling_efficiency": round(eff, 3),
        "runs_8": samples[8],
        "runs_32": samples[32],
    }


def run_scaling() -> dict:
    """Sandbox substitute for the N vs 4N cluster-size criterion, in
    BOTH regimes: the engine default (reservation ratio 0.3) AND the
    plain regime (reservation off). The default regime's 8-CPU leg
    idles under the streaming executor's per-operator reservation
    (BASELINE.md round-4 four-quadrant), which inflates the 8→32 ratio
    past 1.0 — the plain regime is the honest non-super-linear number;
    the artifact carries both. Persists to SCALING.json so the plain
    ``bench.py`` run embeds the measurement in the per-round record."""
    out = {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "order": "ABBA (8,32,32,8) per regime",
        "sf": SF_DIR,
        "regimes": {
            "default_reservation_0.3": _scaling_one_regime("0.3"),
            "plain_reservation_off": _scaling_one_regime("off"),
            # the headline replay is MEMORY-BANDWIDTH-bound once
            # reservation stops idling the 8-CPU leg (8 CPUs already
            # run ~1.7M ev/s on this box), so its single-node 8→32
            # ratio under-represents true multi-node scaling — the
            # analyzed pipeline is CPU-bound (JSON parse + lattice)
            # and gives the honest compute-scaling number
            "analyzed_compute_bound_reservation_off":
                _scaling_one_regime("off", mode="analyzed"),
        },
    }
    # headline fields mirror the old single-regime shape (default regime)
    d = out["regimes"]["default_reservation_0.3"]
    out["events_per_sec_8"] = d["events_per_sec_8"]
    out["events_per_sec_32"] = d["events_per_sec_32"]
    out["scaling_efficiency"] = d["scaling_efficiency"]
    with open(SCALING_ARTIFACT, "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once()))
