"""In-query forensics sidecar for driver-only divergence hunts.

Motivation: q36_simhash failed the external driver's value-hash check in
rounds 4 and 5 while passing every local gate (full sweeps, isolated
local[32] reps, pytest) — a divergence living in something only the
driver's environment exercises. The r5 verdict's remedy is to make the
query leave evidence from INSIDE its own execution: a canonical dump of
what Spark actually produced in THAT process, per-tier digests to localize
which tier diverged, and the session facts (versions, confs, core count)
that differ between harnesses. If a driver run ever mismatches again, the
sidecar written during that exact run pins the Spark-side bytes, so the
remaining suspects are the oracle engine or the comparator — one round of
inspection instead of three of blind hardening.

Cost/safety contract:
* Never breaks the query — every step is wrapped; failures degrade to a
  best-effort error record or silence.
* One extra execution of the final DataFrame (a collect guarded by a row
  cap). Correctness-tier row counts are small by construction; above the
  cap the dump is skipped and the capture records only the truncation.
* Gated by MINARROW_FORENSICS: unset → only pinned investigations (q36)
  capture; "1" → every adopter captures; "0" → nothing captures
  (bench.py sets this — capture must stay out of timed windows).

Reference anchor: determinism across engines is the engine-layer
obligation the reference delegates to its callers
(/root/reference/src/kernels/arithmetic/mod.rs:30-31); when two engines
disagree, the first diagnostic need is a faithful record of what each one
computed.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from minarrow_spark._canon import canon_value as _canon

_ROW_CAP = 200_000
# Keep the sidecar a signal, not a landfill: every capture prunes its tag
# directory to the newest KEEP_LAST files (r6 accumulated 43 q36 JSONs in
# one round — one per pytest run).
_KEEP_LAST = 8
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _enabled(always: bool) -> bool:
    flag = os.environ.get("MINARROW_FORENSICS")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return always


def _rotate(out_dir: str, keep: int = _KEEP_LAST) -> None:
    """Delete all but the newest ``keep`` capture files in ``out_dir``
    (names are epoch-ms, so lexicographic-by-int order IS age order)."""
    try:
        files = sorted(
            (f for f in os.listdir(out_dir) if f.endswith(".json")),
            key=lambda f: int(f[:-5]) if f[:-5].isdigit() else 0,
        )
        for stale in files[:-keep] if keep > 0 else files:
            os.remove(os.path.join(out_dir, stale))
    except Exception:  # noqa: BLE001, S110 — rotation must never break capture
        pass


def _session_facts(spark) -> dict:
    facts: dict = {"epoch": time.time()}
    def _try(key, fn):
        try:
            facts[key] = fn()
        except Exception as ex:  # noqa: BLE001 — facts are best-effort
            facts[key] = f"<err {type(ex).__name__}>"

    import sys

    _try("python", lambda: sys.version.split()[0])
    _try("spark_version", lambda: spark.version)
    _try("master", lambda: spark.sparkContext.master)
    _try("default_parallelism", lambda: spark.sparkContext.defaultParallelism)
    _try(
        "java_version",
        lambda: spark.sparkContext._jvm.System.getProperty("java.version"),
    )
    _try("duckdb_version", lambda: __import__("duckdb").__version__)
    _try("pyspark_module", lambda: __import__("pyspark").__version__)
    for conf in (
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.enabled",
        "spark.sql.ansi.enabled",
        "spark.sql.session.timeZone",
        "spark.sql.execution.arrow.pyspark.enabled",
        "spark.sql.legacy.parquet.nanosAsLong",
    ):
        # Spark 4's conf.get(key, default) raises IllegalArgumentException
        # for some keys; plain get + except is the portable form.
        try:
            facts[conf] = spark.conf.get(conf)
        except Exception:  # noqa: BLE001
            facts[conf] = "<unset>"
    return facts


def capture(
    tag: str,
    df,
    spark,
    *,
    always: bool = False,
    tier_col: str | None = None,
    extra: dict | None = None,
) -> None:
    """Write `.scratch/<tag>_forensics/<epoch_ms>.json` recording what this
    exact process computed for ``df``: sorted canonical rows (columns
    ordered by name — the comparator convention), a whole-result md5, a
    per-``tier_col``-value md5 to localize divergence, and session facts.

    ``always=True`` marks a pinned investigation that captures even without
    MINARROW_FORENSICS=1 (so it fires inside the external driver's run,
    which sets no env vars). Never raises.
    """
    if not _enabled(always):
        return
    try:
        out_dir = os.path.join(_REPO_ROOT, ".scratch", f"{tag}_forensics")
        os.makedirs(out_dir, exist_ok=True)
        record: dict = {"tag": tag, "facts": _session_facts(spark)}
        if extra:
            record["extra"] = extra
        try:
            rows = df.limit(_ROW_CAP + 1).collect()
            cols = list(df.columns)
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            record["columns_sorted"] = [cols[i] for i in order]
            if len(rows) > _ROW_CAP:
                record["truncated_at"] = _ROW_CAP
            else:
                canon = sorted(
                    tuple(_canon(r[i]) for i in order) for r in rows
                )
                record["n_rows"] = len(canon)
                record["md5_all"] = hashlib.md5(
                    "\n".join("|".join(t) for t in canon).encode()
                ).hexdigest()
                if tier_col is not None and tier_col in cols:
                    ti = record["columns_sorted"].index(tier_col)
                    tiers: dict[str, list] = {}
                    for t in canon:
                        tiers.setdefault(t[ti], []).append(t)
                    record["tiers"] = {
                        k: {
                            "n_rows": len(v),
                            "md5": hashlib.md5(
                                "\n".join("|".join(t) for t in v).encode()
                            ).hexdigest(),
                        }
                        for k, v in sorted(tiers.items())
                    }
                record["rows"] = ["|".join(t) for t in canon]
        except Exception as ex:  # noqa: BLE001
            record["collect_error"] = f"{type(ex).__name__}: {ex}"[:500]
        path = os.path.join(out_dir, f"{int(time.time() * 1000)}.json")
        with open(path, "w") as fh:
            json.dump(record, fh)
        _rotate(out_dir)
    except Exception:  # noqa: BLE001, S110 — forensics must never break a query
        pass
