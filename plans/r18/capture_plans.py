"""Capture .explain('formatted') for named registered queries.

Usage: python plans/r18/capture_plans.py <suffix> name1 name2 ...
Writes plans/r18/<name>_<suffix>.txt for each query.
"""
import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from golang_etl_spark.registry import all_queries
from golang_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"

def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="plan_capture")
    avail = all_queries()
    for name in names:
        spec = avail.get(name)
        if spec is None:
            print(f"SKIP unknown {name}")
            continue
        try:
            df = spec.fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            out = f"/root/repo/plans/r18/{name}_{suffix}.txt"
            with open(out, "w") as f:
                f.write(buf.getvalue())
            print(f"OK {name} -> {out}")
        except Exception as exc:
            print(f"ERR {name}: {type(exc).__name__}: {exc}")
        spark.catalog.clearCache()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(True)
    spark.stop()

if __name__ == "__main__":
    main()
