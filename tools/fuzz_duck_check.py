#!/usr/bin/env python3
"""DuckDB third leg of the differential fuzz gate.

Reads the JSONL written by `sbt "Test/runMain graft.FuzzDuckDump ..."`
(one line per seed: {seed, arm, dk, rows}), replays each `dk` query in
DuckDB over the same parquet fixtures, canonicalizes rows by the SAME
rules as FuzzGrammar.canon (null -> "<null>", floating -> %.6f, else
str), and multiset-compares against the recorded CH-leg rows.

Usage: python3 tools/fuzz_duck_check.py <sfDir> <dump.jsonl> [report.json]

Exit 0 and a summary on full agreement; exit 1 with per-seed diffs
otherwise. The optional report path writes the sweep artifact
(seeds, per-arm counts, mismatches).
"""
import datetime
import json
import sys
from collections import Counter
from decimal import Decimal

import duckdb


def canon_value(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):  # Row.toString spells Scala booleans lowercase
        return "true" if v else "false"
    if isinstance(v, float):
        return "%.6f" % v
    if isinstance(v, Decimal):
        return "%.6f" % float(v)
    if isinstance(v, datetime.datetime):
        # mirror FuzzGrammar.fmtTs: trailing-zero-trimmed microseconds
        base = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            return base + "." + ("%06d" % v.microsecond).rstrip("0")
        return base
    return str(v)


def canon_rows(rows):
    return sorted("|".join(canon_value(v) for v in r) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fuzz_duck.jsonl"
    report_path = sys.argv[3] if len(sys.argv) > 3 else None

    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    arms = Counter()
    mismatches = []
    errors = []
    n = 0
    nonempty = 0
    for line in open(dump):
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        n += 1
        arms[rec["arm"]] += 1
        try:
            got = canon_rows(con.sql(rec["dk"]).fetchall())
        except Exception as e:  # noqa: BLE001 - report and continue
            errors.append({"seed": rec["seed"], "arm": rec["arm"],
                           "error": str(e).split("\n")[0], "dk": rec["dk"]})
            continue
        want = sorted(rec["rows"])
        if want:
            nonempty += 1
        if got != want:
            only_duck = [r for r in got if r not in want][:3]
            only_ch = [r for r in want if r not in got][:3]
            mismatches.append({
                "seed": rec["seed"], "arm": rec["arm"],
                "ch_rows": len(want), "duck_rows": len(got),
                "ch_only": only_ch, "duck_only": only_duck,
                "dk": rec["dk"]})

    ok = not mismatches and not errors
    print(f"== fuzz-duck: {n} seeds, {nonempty} non-empty, "
          f"{len(mismatches)} mismatches, {len(errors)} duck errors ==")
    for m in mismatches[:5]:
        print(f"seed {m['seed']} ({m['arm']}): CH {m['ch_rows']} rows vs "
              f"DuckDB {m['duck_rows']}\n  dk: {m['dk']}\n"
              f"  ch-only: {m['ch_only']}\n  duck-only: {m['duck_only']}")
    for e in errors[:5]:
        print(f"seed {e['seed']} ({e['arm']}) DUCK ERROR: {e['error']}\n"
              f"  dk: {e['dk']}")
    if report_path:
        json.dump({
            "seeds": n, "non_empty": nonempty,
            "arms": dict(sorted(arms.items())),
            "mismatches": mismatches, "duck_errors": errors,
            "sf_dir": sf_dir, "agreement": ok,
        }, open(report_path, "w"), indent=1)
        print(f"report -> {report_path}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
