"""Equal-weather scratch-clone A/B (r14, VERDICT r13 item 1): the
`multimodal_video_frame_stats` 2.16x min-series drift landed in the
round that refactored its exact code path (`_avi_stream_info` + the
codec dispatch in `video_frame_stats`) — settle weather vs code with
the same methodology that settled IVF-PQ (r13) and hotlog (r12).

Arms: UNCHANGED r12 code (scratch worktree of commit ac72b1e at
/tmp/r12tree) vs current HEAD (/root/repo). Each pass spawns one
subprocess per arm, interleaved A/B/A/B..., so both arms sample the
same machine weather. Each subprocess builds its own session, runs
one UNTIMED warm pass (JIT + parquet footer caches), then two timed
passes — 2 timed readings x 3 passes = 6 per arm.

Usage: python tools/video_ab.py [n_passes]
"""
import json
import os
import subprocess
import sys

R12_TREE = "/tmp/r12tree"
HEAD_TREE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, time
sys.path.insert(0, {tree!r})
from pyspark_ingestion_spark.session import get_spark_session
from pyspark_ingestion_spark.queries import all_queries

spark = get_spark_session(app_name="video-ab")
fn = all_queries()["multimodal_video_frame_stats"].fn
fn(spark, "/root/testdata/sf0.1").collect()  # warm, untimed
out = []
for _ in range(2):
    t0 = time.perf_counter()
    fn(spark, "/root/testdata/sf0.1").collect()
    out.append(round(time.perf_counter() - t0, 3))
print("TIMED " + ",".join(str(x) for x in out))
"""


def run_arm(tree: str) -> list[float]:
    p = subprocess.run(
        [sys.executable, "-c", _CHILD.format(tree=tree)],
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
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    res = {"r12": [], "head": []}
    for i in range(n_passes):
        res["r12"].extend(run_arm(R12_TREE))
        print(f"pass {i}: r12={res['r12'][-2:]}", flush=True)
        res["head"].extend(run_arm(HEAD_TREE))
        print(f"pass {i}: head={res['head'][-2:]}", flush=True)
    for arm, xs in res.items():
        xs_sorted = sorted(xs)
        med = xs_sorted[len(xs) // 2]
        print(f"{arm}: runs={xs} min={min(xs)} median={med}", flush=True)
    print("JSON " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
