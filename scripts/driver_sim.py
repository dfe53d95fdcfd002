"""Simulate the driver's full correctness sweep: run every registered query
through __spark_entry__ in a VANILLA SparkSession and compare against the
DuckDB oracle, exactly like the per-round CORRECTNESS_r{N}.json run.

Usage: python scripts/driver_sim.py [--shuffle-order [SEED]] [--repeat N]
                                    [--master M] [sf_dir] [query_name ...]
Defaults to /root/testdata/sf0.01, all queries, and master local[32] —
the driver's grading core count (r5 verdict: the sim must be bit-faithful
to the grading environment; override with --master local[8] for quick
low-core iteration).

--shuffle-order runs the sweep in a random (seeded, printed) order instead
of registration order — the session-state order-independence check from the
r4 verdict (catalog confs must not depend on which query runs first).
--repeat N runs each selected query N times and also asserts the canonical
value set is IDENTICAL across repeats (nondeterminism hunt, q36-style).
"""

from __future__ import annotations

import importlib
import random
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main() -> int:
    argv = sys.argv[1:]
    shuffle_seed = None
    repeat = 1
    master = "local[32]"
    while argv and argv[0].startswith("--"):
        if argv[0] == "--shuffle-order":
            argv.pop(0)
            shuffle_seed = (
                int(argv.pop(0)) if argv and argv[0].isdigit() else random.randrange(10**6)
            )
        elif argv[0] == "--repeat":
            argv.pop(0)
            repeat = int(argv.pop(0))
        elif argv[0] == "--master":
            argv.pop(0)
            master = argv.pop(0)
        else:
            raise SystemExit(f"unknown flag {argv[0]}")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master(master).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # Harness facts header: every local-vs-driver comparison should start
    # from identical environment facts (r5 verdict task 6).
    import duckdb as _duckdb

    print(
        f"master={spark.sparkContext.master} "
        f"spark={spark.version} duckdb={_duckdb.__version__} "
        f"java={spark.sparkContext._jvm.System.getProperty('java.version')} "
        f"python={sys.version.split()[0]} sf_dir={sf_dir}",
        flush=True,
    )

    mod = importlib.import_module("__spark_entry__")
    from tests.oracle_utils import compare, duckdb_conn

    n = len(mod.entry(spark).collect())
    print(f"entry() -> {n} rows", flush=True)

    qs, osql = mod.queries(), mod.oracle_sql()
    con = duckdb_conn(sf_dir)
    names = [n for n in qs if not only or n in only]
    if shuffle_seed is not None:
        print(f"shuffled order, seed={shuffle_seed}", flush=True)
        random.Random(shuffle_seed).shuffle(names)
    from tests.oracle_utils import canon_rows

    bad = []
    for name in names:
        fn = qs[name]
        t0 = time.time()
        seen = None
        try:
            for i in range(repeat):
                df = fn(spark, sf_dir)
                if name in osql:
                    ok, msg = compare(df, con, osql[name])
                else:
                    rows = df.count()
                    ok, msg = rows >= 0, f"rows-only: {rows}"
                if not ok:
                    break
                if repeat > 1:
                    canon = canon_rows(list(df.columns), [tuple(r) for r in df.collect()])
                    if seen is None:
                        seen = canon
                    elif canon != seen:
                        ok, msg = False, f"NONDETERMINISTIC: repeat {i} diverged"
                        break
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC: {type(e).__name__}: {e}"
        dt = time.time() - t0
        rep = f" x{repeat}" if repeat > 1 else ""
        print(f"{'PASS' if ok else 'FAIL'} {name:28s} {dt:6.1f}s{rep}  {msg[:200]}",
              flush=True)
        if not ok:
            bad.append(name)
    print(
        f"\n{len(names) - len(bad)}/{len(names)} pass"
        + (f"; FAILED: {bad}" if bad else "")
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
