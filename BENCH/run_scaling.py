"""Scaling-efficiency evidence (north_rule: ≥0.8 from N to 4N).

Runs the identical bench job (bench.py) in separate Spark JVMs at
local[8] and local[32] on the same input and writes
BENCH/BASELINE.md with throughput at both parallelism levels and the
scaling efficiency  eff = T_8 / (4 × T_32)  (equivalently
throughput_32 / (4 × throughput_8)).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_once(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def run(cpus: int, reps: int = 2) -> dict:
    """Repeat the bench and take per-query minima — the sandbox shares
    CPU with neighbors, so min is the best noise-robust estimator."""
    runs = [run_once(cpus) for _ in range(reps)]
    best = dict(runs[0])
    best["queries"] = {
        q: min(r["queries"][q] for r in runs) for q in runs[0]["queries"]
    }
    best["value"] = round(sum(best["queries"].values()), 3)
    spatial = (
        best["queries"]["extract_index"]
        + best["queries"]["knn_join"]
        + best["queries"]["pip_tiles"]
    )
    best["docs_per_sec"] = round(best["n_docs"] / spatial, 1)
    best["join_rows_per_sec"] = round(
        (best["knn_rows"] + best["pip_rows"]) / spatial, 1
    )
    return best


def main() -> None:
    r8 = run(8)
    r32 = run(32)
    spatial8 = r8["queries"]["extract_index"] + r8["queries"]["knn_join"] + r8["queries"]["pip_tiles"]
    spatial32 = r32["queries"]["extract_index"] + r32["queries"]["knn_join"] + r32["queries"]["pip_tiles"]
    eff_total = r8["value"] / (4 * r32["value"])
    eff_spatial = spatial8 / (4 * spatial32)

    lines = [
        "# BENCH/BASELINE.md — measured throughput + scaling efficiency",
        "",
        f"Input: `{SF_DIR}` (lineitem-derived interleaved docs: "
        f"{r32['n_docs']} docs, {r32['n_points']} media points). Same job, same input, "
        "two parallelism levels in separate JVMs (sandbox stand-in for N vs 4N executors).",
        "",
        "| parallelism | suite wall (s) | spatial pipeline (s) | docs/sec | join rows/sec |",
        "|---|---|---|---|---|",
        f"| local[8] (N) | {r8['value']:.1f} | {spatial8:.1f} | {r8['docs_per_sec']:.0f} | {r8['join_rows_per_sec']:.0f} |",
        f"| local[32] (4N) | {r32['value']:.1f} | {spatial32:.1f} | {r32['docs_per_sec']:.0f} | {r32['join_rows_per_sec']:.0f} |",
        "",
        f"**Scaling efficiency (N→4N)**: suite {eff_total:.2f}, spatial pipeline {eff_spatial:.2f} "
        "(target ≥ 0.8; eff = T_N / (4·T_4N)).",
        "",
        "Per-query seconds:",
        "",
        "| query | local[8] | local[32] |",
        "|---|---|---|",
    ]
    for q in r8["queries"]:
        lines.append(f"| {q} | {r8['queries'][q]:.1f} | {r32['queries'][q]:.1f} |")
    lines += [
        "",
        f"Raw local[8]: `{json.dumps(r8)}`",
        "",
        f"Raw local[32]: `{json.dumps(r32)}`",
        "",
        f"Generated {time.strftime('%Y-%m-%d %H:%M:%SZ', time.gmtime())}.",
    ]
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}: eff_total={eff_total:.2f} eff_spatial={eff_spatial:.2f}")


if __name__ == "__main__":
    main()
