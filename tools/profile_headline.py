"""Per-op build-vs-exec profiling + before/after plan capture (guide §1).

For each headline op: time (a) plan CONSTRUCTION — the ``fn(spark, sf_dir)``
call, py4j + parse + any tuning collects — and (b) EXECUTION — the noop-sink
write of the returned frame — separately, min over N cache-cold reps. This
splits the bench seconds into the driver-side and executor-side halves so an
optimization targets the one that is actually paying (r10 showed plan
construction dominates several headline ops at sf0.1).

Also dumps ``.explain("formatted")`` per op into plans/<tag>/<op>_<suffix>.txt.

Usage: python tools/profile_headline.py [sf_dir] [reps] [plan_suffix] [ops...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE
from australis_indexer_spark.registry import load_all
from australis_indexer_spark.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    suffix = sys.argv[3] if len(sys.argv) > 3 else None
    names = tuple(sys.argv[4:]) or HEADLINE
    spark = get_session("profile")
    ops = load_all()

    # warm-up
    ops[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    plans_dir = Path(__file__).resolve().parent.parent / "plans" / "r11"
    rows = []
    for name in names:
        tb, te = [], []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = ops[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            tb.append(t1 - t0)
            te.append(t2 - t1)
        rows.append((name, min(tb), min(te)))
        if suffix:
            plans_dir.mkdir(parents=True, exist_ok=True)
            df = ops[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (plans_dir / f"{name}_{suffix}.txt").write_text(plan)

    print(f"{'op':34s} {'build':>7s} {'exec':>7s} {'total':>7s}")
    tot_b = tot_e = 0.0
    for name, b, e in rows:
        print(f"{name:34s} {b:7.3f} {e:7.3f} {b + e:7.3f}")
        tot_b += b
        tot_e += e
    print(f"{'TOTAL':34s} {tot_b:7.3f} {tot_e:7.3f} {tot_b + tot_e:7.3f}")


if __name__ == "__main__":
    main()
