"""Diff two forensics captures tier-by-tier (r6 verdict task 5).

Usage:
    python scripts/forensics_diff.py A.json B.json [--max-rows 10]
    python scripts/forensics_diff.py q36            # newest two captures of tag

Prints a per-tier verdict (match / n_rows delta / md5 delta) and, where the
row dumps are present, the first row-level differences — the exact workflow
that convicted the r4/r5 q36 driver mismatch, packaged.
Exit code 0 = captures agree, 1 = any tier differs, 2 = usage/load error.
"""

from __future__ import annotations

import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _resolve(args: list[str]) -> tuple[str, str]:
    if len(args) == 1:  # tag form: newest two captures of .scratch/<tag>_forensics
        d = os.path.join(_REPO_ROOT, ".scratch", f"{args[0]}_forensics")
        files = sorted(
            (f for f in os.listdir(d) if f.endswith(".json")),
            key=lambda f: int(f[:-5]) if f[:-5].isdigit() else 0,
        )
        if len(files) < 2:
            raise SystemExit(f"need >=2 captures in {d}, found {len(files)}")
        return os.path.join(d, files[-2]), os.path.join(d, files[-1])
    return args[0], args[1]


def _row_diffs(ra: list[str], rb: list[str], cap: int) -> list[str]:
    sa, sb = set(ra), set(rb)
    out = []
    for r in ra:
        if r not in sb:
            out.append(f"  only-in-A: {r}")
            if len(out) >= cap:
                return out
    for r in rb:
        if r not in sa:
            out.append(f"  only-in-B: {r}")
            if len(out) >= cap:
                return out
    return out


def diff(path_a: str, path_b: str, max_rows: int = 10) -> int:
    with open(path_a) as fh:
        a = json.load(fh)
    with open(path_b) as fh:
        b = json.load(fh)
    print(f"A = {path_a}\nB = {path_b}")
    for side, rec in (("A", a), ("B", b)):
        facts = rec.get("facts", {})
        print(
            f"{side}: tag={rec.get('tag')} n_rows={rec.get('n_rows')} "
            f"md5={rec.get('md5_all')} spark={facts.get('spark_version')} "
            f"master={facts.get('master')} duckdb={facts.get('duckdb_version')}"
        )
    rc = 0
    if a.get("columns_sorted") != b.get("columns_sorted"):
        print(f"COLUMNS differ: {a.get('columns_sorted')} vs {b.get('columns_sorted')}")
        rc = 1
    ta, tb = a.get("tiers") or {}, b.get("tiers") or {}
    for tier in sorted(set(ta) | set(tb)):
        xa, xb = ta.get(tier), tb.get(tier)
        if xa is None or xb is None:
            print(f"tier {tier!r}: present only in {'A' if xa else 'B'}")
            rc = 1
        elif xa["md5"] == xb["md5"]:
            print(f"tier {tier!r}: match ({xa['n_rows']} rows, {xa['md5'][:12]})")
        else:
            print(
                f"tier {tier!r}: DIFF n_rows {xa['n_rows']} vs {xb['n_rows']}, "
                f"md5 {xa['md5'][:12]} vs {xb['md5'][:12]}"
            )
            rc = 1
    if not ta and not tb and a.get("md5_all") != b.get("md5_all"):
        print("whole-result md5 DIFF (no tier column captured)")
        rc = 1
    if rc and "rows" in a and "rows" in b:
        print("first row-level differences (canonical, columns sorted by name):")
        for line in _row_diffs(a["rows"], b["rows"], max_rows):
            print(line)
    print("RESULT:", "match" if rc == 0 else "DIVERGENT")
    return rc


def main(argv: list[str]) -> int:
    args = [a for a in argv if not a.startswith("--")]
    max_rows = 10
    for a in argv:
        if a.startswith("--max-rows"):
            max_rows = int(a.split("=", 1)[1]) if "=" in a else int(
                argv[argv.index(a) + 1]
            )
    if not 1 <= len(args) <= 2:
        print(__doc__)
        return 2
    try:
        pa, pb = _resolve(args)
    except (OSError, SystemExit) as ex:
        print(ex)
        return 2
    return diff(pa, pb, max_rows)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
