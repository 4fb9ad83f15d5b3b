"""Capture .explain("formatted") for the bench headline queries.

Usage: python tools/capture_plans.py <outdir> [sf_dir] [name ...]

Writes <outdir>/<query>_<tag>.txt for every headline query (or the
names given), where <tag> is the OPTIMIZATION round evidence label —
pass it via $PLAN_TAG (default "before"). Plan capture is driver-side
only (no jobs run), so it is safe to run alongside other work.
"""

from __future__ import annotations

import io
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    os.makedirs(outdir, exist_ok=True)
    tag = os.environ.get("PLAN_TAG", "before")

    from bench import HEADLINE
    from pyspark_ingestion_spark.queries import all_queries
    from pyspark_ingestion_spark.session import get_spark_session

    names = sys.argv[3:] or HEADLINE
    spark = get_spark_session(app_name="capture-plans")
    registry = all_queries()
    for name in names:
        if name not in registry:
            print(f"skip {name}: not in registry")
            continue
        df = registry[name].fn(spark, sf_dir)
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
