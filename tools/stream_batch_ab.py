"""Equal-weather scratch-clone A/B for the STREAM batch rows (r15):
the opt_ab.py methodology (interleaved base/head subprocesses, each
with its own session, one untimed bootstrap batch, steady-state batches
timed) applied to the bench's per-batch stream fixtures, which are not
registry queries. Each arm imports ITS OWN tree's bench.py and runs the
same `_stream_*_ctx` fixture the driver times.

Usage: python tools/stream_batch_ab.py <family> [n_passes] [base_tree]
  family ∈ {hotlog, substring, fingerprint}
  base_tree defaults to /tmp/r14base
"""
import json
import os
import subprocess
import sys

HEAD_TREE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CTX = {
    "hotlog": "_stream_admission_ctx",
    "substring": "_stream_substring_ctx",
    "fingerprint": "_stream_fingerprint_ctx",
}

_CHILD = r"""
import importlib.util, shutil, sys, tempfile
sys.path.insert(0, {tree!r})
from pyspark_ingestion_spark.session import get_spark_session

spec = importlib.util.spec_from_file_location("benchmod", {tree!r} + "/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

spark = get_spark_session(app_name="stream-ab")
spark.sparkContext.setJobDescription({family!r} + " [stream A/B]")
tmp = tempfile.mkdtemp(prefix="stream_ab_")
try:
    run = getattr(bench, {ctx!r})(spark, tmp + "/t")
    times = [run(b) for b in range(5)]  # batch 0 = bootstrap, dropped
    print("TIMED " + ",".join(str(x) for x in times[1:]))
finally:
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
"""


def run_arm(tree: str, family: str) -> list[float]:
    p = subprocess.run(
        [sys.executable, "-c",
         _CHILD.format(tree=tree, family=family, ctx=_CTX[family])],
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
    family = sys.argv[1]
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    base_tree = sys.argv[3] if len(sys.argv) > 3 else "/tmp/r14base"
    res = {"base": [], "head": []}
    for i in range(n_passes):
        res["base"].extend(run_arm(base_tree, family))
        print(f"pass {i}: base={res['base'][-4:]}", flush=True)
        res["head"].extend(run_arm(HEAD_TREE, family))
        print(f"pass {i}: head={res['head'][-4:]}", flush=True)
    for arm, xs in res.items():
        med = sorted(xs)[len(xs) // 2]
        print(f"{arm}: min={min(xs)} median={med} runs={xs}", flush=True)
    print("JSON " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
