"""Multi-node packaging smoke test (NEXT.md #7 / VERDICT r3 #8).

Production launch shape is::

    ray job submit --working-dir /root/repo \
        -- python -m kafka_connect_mongo_ray replay --snapshot ... \
           --checkpoints ... --events ... --partitions ... --buckets ...

The Jobs API needs the dashboard HTTP server, whose dependencies are
not in this container (``ray start --include-dashboard=true`` raises
"Cannot include dashboard with missing packages"), so this smoke test
verifies the SAME packaging mechanism one layer down: ``ray job
submit --working-dir`` ships the directory through the GCS runtime-env
package store and workers import it with no local PYTHONPATH — exactly
what ``runtime_env={"py_modules": [...]}`` does. The test:

1. starts a standalone head node (``ray start --head``),
2. connects a driver with the package shipped via ``py_modules``,
3. runs a remote task that imports the engine INSIDE the worker (cwd
   is a scratch dir, so only the shipped package can satisfy the
   import) and replays a small event stream through the full
   normalize → shuffle → apply pipeline,
4. asserts the replay summary and tears the cluster down.

Exit 0 = the package is job-submit shippable. If the dashboard deps
are present (real cluster), pass ``--use-jobs-api`` to exercise the
actual ``ray job submit`` path instead.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_jobs_api(tmp: str) -> int:
    """The real thing, for environments with dashboard deps."""
    cmd = [
        "ray", "job", "submit", "--working-dir", REPO, "--",
        sys.executable, "-m", "kafka_connect_mongo_ray", "replay",
        "--snapshot", f"{tmp}/s", "--checkpoints", f"{tmp}/c",
        "--events", "20000", "--partitions", "4", "--buckets", "8",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    print(proc.stdout[-2000:])
    return proc.returncode


def run_py_modules(tmp: str) -> int:
    """Same packaging mechanism without the HTTP front door."""
    import ray

    ray.init(
        address="auto",
        runtime_env={"py_modules": [os.path.join(REPO,
                                                 "kafka_connect_mongo_ray")]},
        logging_level="ERROR",
    )

    @ray.remote
    def replay_in_worker(snapshot: str, checkpoints: str) -> dict:
        # import resolves from the GCS-shipped package only: the task
        # runs in a worker whose cwd/sys.path do not include the repo
        from kafka_connect_mongo_ray.config import EngineConfig
        from kafka_connect_mongo_ray.pipelines.cdc import run_replay
        from kafka_connect_mongo_ray.sources.gen import (
            GenSpec,
            change_event_dataset,
            synth_repo_files,
        )

        spec = GenSpec(num_partitions=4, events_per_partition=5000, seed=3)
        base = synth_repo_files(20, 50, seed=3)
        cfg = EngineConfig(snapshot_dir=snapshot, checkpoint_dir=checkpoints,
                           num_buckets=8)
        return run_replay(change_event_dataset(spec, base), cfg)

    summary = ray.get(replay_in_worker.remote(f"{tmp}/s", f"{tmp}/c"))
    ray.shutdown()
    print(json.dumps({k: summary[k] for k in ("version", "live_rows",
                                              "events_in")}))
    # events_in counts events surviving the resume-token source filter
    # and dup neutralization, so assert presence rather than the raw
    # generated count
    ok = (summary["version"] == 1 and summary["live_rows"] > 0
          and summary["events_in"] > 0)
    print("PACKAGING SMOKE:", "OK" if ok else "FAILED")
    return 0 if ok else 1


def run_two_node(tmp: str) -> int:
    """Genuine multi-node scheduling: a SECOND ray node joins the head
    (own raylet + object store, same box), the engine package ships
    through GCS to it, and the replay driver task is PINNED to the
    non-head node via a custom resource — so the import, the pipeline
    driver, and its Ray Data tasks all run off-head and every block
    crosses a raylet boundary. Asserts 2 alive nodes and that the task
    really ran on the joined node."""
    # join via the ADDRESS THE HEAD ADVERTISES: joining through a
    # different interface (127.0.0.1 vs the node IP) makes the second
    # `ray start` silently boot its own GCS instead of joining
    from ray._private.services import get_node_ip_address

    head_addr = f"{get_node_ip_address()}:6379"
    second = subprocess.run(
        ["ray", "start", f"--address={head_addr}", "--num-cpus=4",
         '--resources={"nodeB": 4}', "--disable-usage-stats"],
        capture_output=True, text=True)
    if second.returncode != 0:
        print(second.stderr[-1000:])
        return 2
    import ray

    # EXPLICIT head address: address="auto" with RAY_ADDRESS=local in
    # the environment silently boots a separate one-node instance and
    # the nodeB-pinned task pends forever on the wrong cluster
    ray.init(
        address=head_addr,
        runtime_env={"py_modules": [os.path.join(REPO,
                                                 "kafka_connect_mongo_ray")]},
        logging_level="ERROR",
    )
    alive = [n for n in ray.nodes() if n["Alive"]]
    head_node = ray.get_runtime_context().get_node_id()

    @ray.remote(resources={"nodeB": 1})
    def replay_on_b(snapshot: str, checkpoints: str):
        from kafka_connect_mongo_ray.config import EngineConfig
        from kafka_connect_mongo_ray.pipelines.cdc import run_replay
        from kafka_connect_mongo_ray.sources.gen import (
            GenSpec,
            change_event_dataset,
            synth_repo_files,
        )

        spec = GenSpec(num_partitions=4, events_per_partition=5000, seed=3)
        base = synth_repo_files(20, 50, seed=3)
        cfg = EngineConfig(snapshot_dir=snapshot,
                           checkpoint_dir=checkpoints, num_buckets=8)
        s = run_replay(change_event_dataset(spec, base), cfg)
        import ray as _ray

        return s, _ray.get_runtime_context().get_node_id()

    summary, ran_on = ray.get(replay_on_b.remote(f"{tmp}/s", f"{tmp}/c"))
    ray.shutdown()
    print(json.dumps({"nodes_alive": len(alive),
                      "ran_off_head": ran_on != head_node,
                      **{k: summary[k] for k in ("version", "live_rows",
                                                 "events_in")}}))
    ok = (len(alive) == 2 and ran_on != head_node
          and summary["version"] == 1 and summary["live_rows"] > 0)
    print("TWO-NODE SMOKE:", "OK" if ok else "FAILED")
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--use-jobs-api", action="store_true",
                    help="drive the real `ray job submit` (needs "
                         "dashboard deps)")
    ap.add_argument("--two-node", action="store_true",
                    help="join a second node and pin the replay to it")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="kcm_jobsmoke_")
    subprocess.run(["ray", "stop", "--force"], capture_output=True)
    head = subprocess.run(
        ["ray", "start", "--head", "--num-cpus=4", "--disable-usage-stats"],
        capture_output=True, text=True)
    if head.returncode != 0:
        print(head.stderr[-1000:])
        return 2
    try:
        if args.use_jobs_api:
            return run_jobs_api(tmp)
        if args.two_node:
            return run_two_node(tmp)
        return run_py_modules(tmp)
    finally:
        subprocess.run(["ray", "stop", "--force"], capture_output=True)
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
