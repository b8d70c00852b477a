"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

The rule's criterion — throughput scaling efficiency ≥ 0.8 from N to 4N
executors — cannot use a real cluster in this sandbox, so per the task
protocol we run the SAME job on the SAME input at two parallelism levels
(local[N] vs local[4N], --n picks N) and report throughput at both plus

    efficiency = throughput_4N / (4 · throughput_N)

Each level runs in its own subprocess (a SparkSession's master is fixed at
creation). Results go to stdout as JSON and are appended to
BENCH/BASELINE.md by --write-md.

Usage: python BENCH/scaling.py [--n 2] [--replicas 200] [--write-md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_level(cpus: int, replicas: int, sf_dir: str, trials: int,
              master: str | None = None) -> dict:
    cmd = [sys.executable, os.path.join(HERE, "scaling_run.py"),
           "--cpus", str(cpus), "--replicas", str(replicas),
           "--trials", str(trials), "--sf-dir", sf_dir]
    if master:
        cmd += ["--master", master]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=200)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--write-md", action="store_true")
    ap.add_argument(
        "--n", type=int, default=8,
        help="small cluster size; the large level is 4n (criterion is "
        "N->4N, any N)",
    )
    ap.add_argument(
        "--cluster", action="store_true",
        help="use local-cluster (REAL multi-JVM executors): level 1 = "
        "--n executors, level 2 = 4*--n executors, each with "
        "--exec-cores cores / --exec-mem MB — corroborates the local[N] "
        "thread-scaling proxy with genuine executor scale-out",
    )
    ap.add_argument("--exec-cores", type=int, default=4)
    ap.add_argument("--exec-mem", type=int, default=4096)
    args = ap.parse_args()

    if args.cluster:
        m_small = f"local-cluster[{args.n},{args.exec_cores},{args.exec_mem}]"
        m_big = f"local-cluster[{4 * args.n},{args.exec_cores},{args.exec_mem}]"
        r8 = run_level(args.n * args.exec_cores, args.replicas,
                       args.sf_dir, args.trials, master=m_small)
        r32 = run_level(4 * args.n * args.exec_cores, args.replicas,
                        args.sf_dir, args.trials, master=m_big)
    else:
        r8 = run_level(args.n, args.replicas, args.sf_dir, args.trials)
        r32 = run_level(4 * args.n, args.replicas, args.sf_dir, args.trials)

    eff_build = r32["docs_per_sec"] / (4.0 * r8["docs_per_sec"])
    eff_query = r32["query_qps"] / (4.0 * r8["query_qps"])
    result = {
        "metric": "scaling_efficiency_Nx4",
        "mode": "local-cluster" if args.cluster else "local-threads",
        "n_docs": r8["n_docs"],
        "local8": r8,
        "local32": r32,
        "build_speedup_8_to_32": round(
            r32["docs_per_sec"] / r8["docs_per_sec"], 3
        ),
        "build_scaling_efficiency": round(eff_build, 3),
        "query_scaling_efficiency": round(eff_query, 3),
    }
    print(json.dumps(result))

    if args.write_md:
        md = os.path.join(HERE, "BASELINE.md")
        m8 = r8.get("master", f"local[{r8['cpus']}]")
        m32 = r32.get("master", f"local[{r32['cpus']}]")
        with open(md, "a") as f:
            f.write(
                f"\n## Scaling run ({m8} vs {m32}, "
                f"{r8['n_docs']} docs, best of {len(r8['build_trials_sec'])} "
                f"warm trials per level)\n\n"
                f"| level | build sec (best) | all trials | docs/sec "
                f"| query p50 | query p95 | qps |\n"
                f"|---|---|---|---|---|---|---|\n"
                f"| {m8} | {r8['build_sec']} | {r8['build_trials_sec']} "
                f"| {r8['docs_per_sec']} | {r8['query_p50_sec']} "
                f"| {r8['query_p95_sec']} | {r8['query_qps']} |\n"
                f"| {m32} | {r32['build_sec']} | {r32['build_trials_sec']} "
                f"| {r32['docs_per_sec']} | {r32['query_p50_sec']} "
                f"| {r32['query_p95_sec']} | {r32['query_qps']} |\n\n"
                f"Build speedup {r8['cpus']}→{r32['cpus']} cores: "
                f"{result['build_speedup_8_to_32']}× "
                f"(ideal 4×); **scaling efficiency "
                f"{result['build_scaling_efficiency']}** "
                f"(criterion ≥ 0.8). Query-throughput efficiency "
                f"{result['query_scaling_efficiency']} (latency-bound at "
                f"sandbox scale: per-query fixed job-launch cost dominates; "
                f"the build number is the load-bearing one). Methodology: "
                f"identical input, identical partitioning (96 input splits) "
                f"at both levels; best-of-N warm trials because this "
                f"sandbox is a shared-host microVM with 2-3× run-to-run "
                f"wall-clock noise (see BENCH/scaling_run.py docstring).\n"
            )


if __name__ == "__main__":
    main()
