"""Equal-weather scratch-clone A/B for optimization-round changes
(r14): arm "base" = an unchanged scratch worktree of the
pre-optimization commit, arm "head" = the current working tree. Each
pass spawns one subprocess per arm, interleaved base/head/base/head...,
so both arms sample the same machine weather — the same methodology
that settled the IVF-PQ (r13), hotlog (r12) and video (r14) drift
flags. Each subprocess builds its own session, runs one UNTIMED warm
pass (JIT + parquet footer caches), then two timed passes.

Usage: python tools/opt_ab.py <query_name> [n_passes] [base_tree]

base_tree defaults to /tmp/r14base (create it with:
  git worktree add /tmp/r14base <commit>).
"""
import json
import os
import subprocess
import sys

HEAD_TREE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, time
sys.path.insert(0, {tree!r})
from pyspark_ingestion_spark.session import get_spark_session
from pyspark_ingestion_spark.queries import all_queries

spark = get_spark_session(app_name="opt-ab")
spark.sparkContext.setJobDescription({name!r} + " [opt A/B]")
fn = all_queries()[{name!r}].fn
fn(spark, "/root/testdata/sf0.1").collect()  # warm, untimed
out = []
for _ in range(2):
    t0 = time.perf_counter()
    fn(spark, "/root/testdata/sf0.1").collect()
    out.append(round(time.perf_counter() - t0, 3))
print("TIMED " + ",".join(str(x) for x in out))
"""


def run_arm(tree: str, name: str) -> list[float]:
    p = subprocess.run(
        [sys.executable, "-c", _CHILD.format(tree=tree, name=name)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("TIMED "):
            return [float(x) for x in line[6:].split(",")]
    raise RuntimeError(
        f"arm {tree} produced no TIMED line\nstdout:{p.stdout[-2000:]}"
        f"\nstderr:{p.stderr[-2000:]}"
    )


def main() -> None:
    name = sys.argv[1]
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    base_tree = sys.argv[3] if len(sys.argv) > 3 else "/tmp/r14base"
    res = {"base": [], "head": []}
    for i in range(n_passes):
        res["base"].extend(run_arm(base_tree, name))
        print(f"pass {i}: base={res['base'][-2:]}", flush=True)
        res["head"].extend(run_arm(HEAD_TREE, name))
        print(f"pass {i}: head={res['head'][-2:]}", flush=True)
    for arm, xs in res.items():
        med = sorted(xs)[len(xs) // 2]
        print(f"{arm}: runs={xs} min={min(xs)} median={med}", flush=True)
    print("JSON " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
