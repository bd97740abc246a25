#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule).

A real multi-executor cluster isn't available in this sandbox, so the
N-vs-4N-executor criterion is evidenced the way the driver prescribes:
the SAME crawl workload (identical seeds, wave size, rounds, shard and
salt counts) at two parallelism levels — local[8] and local[32] — each
in a fresh JVM, reporting throughput at both plus scaling efficiency

    eff = (throughput_4N / throughput_N) / 4        (target >= 0.8)

Results are written to BENCH.md. Usage:

    python scripts/scaling_bench.py [--quick]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUICK = "--quick" in sys.argv
SEEDS = int(os.environ.get("SPARK_GRAFT_SCALE_SEEDS", "8000" if QUICK else "48000"))
WAVE = int(os.environ.get("SPARK_GRAFT_SCALE_WAVE", "4000" if QUICK else "32000"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "2" if QUICK else "3"))

INNER = """
import json, sys
sys.path.insert(0, {repo!r})
import bench
from horseman_article_parser_spark.plans.crawl import CrawlConfig
from horseman_article_parser_spark.session import get_spark
spark = get_spark("scaling-{cpus}", master="local[{cpus}]",
                  extra_conf={{"spark.sql.shuffle.partitions": "{cpus}"}})
spark.sparkContext.setLogLevel("ERROR")
# identical logical workload at both parallelism levels: shard/salt
# counts pinned to 32 so only the executor-thread count varies.
cfg = CrawlConfig(wave_size={wave}, round0_limit={wave},
                  unique_hosts_round0=False,
                  default_host_budget=max({wave} // 40, 4),
                  n_salts=32, n_shards=32, total_bloom_bits=1 << 24,
                  n_hosts=200, lineage_counts=False)
bench._run_crawl(spark, 600, 400, 1, cfg=None)  # warm-up (untimed)
out = bench._run_crawl(spark, {seeds}, {wave}, {rounds}, cfg=cfg)
print("RESULT " + json.dumps(out))
"""


def run_level(cpus: int) -> dict:
    code = INNER.format(repo=REPO, cpus=cpus, seeds=SEEDS, wave=WAVE, rounds=ROUNDS)
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3600,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)},
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            out = json.loads(line[len("RESULT "):])
            out["cpus"] = cpus
            out["wall_total_sec"] = round(time.monotonic() - t0, 1)
            return out
    sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:] + "\n")
    raise RuntimeError(f"no RESULT line from local[{cpus}] run")


def main():
    r8 = run_level(8)
    print(f"local[8]:  {r8['urls_per_sec']} urls/sec ({r8['sec']}s, rounds {r8['round_sec']})")
    r32 = run_level(32)
    print(f"local[32]: {r32['urls_per_sec']} urls/sec ({r32['sec']}s, rounds {r32['round_sec']})")
    eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / 4.0
    print(f"scaling efficiency (N=8 -> 4N=32): {eff:.3f}")

    md = f"""# BENCH — crawl-scheduler throughput & scaling evidence

North rule: ≥0.8 throughput scaling efficiency from N to 4N executors.
No multi-executor cluster exists in this sandbox, so per the driver's
instruction the criterion is evidenced by the same job at two
parallelism levels on identical input (fresh JVM each; shard/salt
counts pinned to 32 at both levels so only executor threads vary).

Workload: CrawlScheduler over a synthetic seed frontier — robots +
politeness budgets + priority top-k wave selection, synthetic fetch,
Arrow-batched article extraction, link canonicalization, sharded-bloom
URL-seen claim, parquet checkpoint per round.
Seeds={SEEDS}, wave_size={WAVE}, rounds={ROUNDS}
(= {r32["urls_scheduled"]} URLs scheduled per run). One untimed warm-up
round amortizes one-time JVM codegen / Python-worker startup.

| parallelism | URLs scheduled | time (s) | per-round (s) | throughput (urls/sec) |
|---|---|---|---|---|
| local[8]  (N)  | {r8["urls_scheduled"]} | {r8["sec"]} | {r8["round_sec"]} | {r8["urls_per_sec"]} |
| local[32] (4N) | {r32["urls_scheduled"]} | {r32["sec"]} | {r32["round_sec"]} | {r32["urls_per_sec"]} |

**Scaling efficiency (throughput_4N / throughput_N) / 4 = {eff:.3f}**
(target ≥ 0.8 → {"MET" if eff >= 0.8 else "NOT MET"})

Reproduce: `python scripts/scaling_bench.py`
(quick variant: `--quick`; knobs: SPARK_GRAFT_SCALE_{{SEEDS,WAVE,ROUNDS}}).
Generated {time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime())}.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
