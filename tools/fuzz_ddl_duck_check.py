#!/usr/bin/env python3
"""DuckDB third leg of the DDL/session fuzz gate.

Reads the JSONL written by `sbt "Test/runMain graft.FuzzDdlDump ..."`
(one line per seed: {seed, arm, setup, final_sql, rows[, final_sql2,
rows2]}), replays each session's DuckDB script (CREATE TABLE + INSERT +
UPDATE/DELETE + collapse swaps) in a fresh in-memory DuckDB, and
multiset-compares the end state (and, for engine arms, the collapse
query) against the engine's recorded state.

Arm-coverage assertion: the dump's first line is a meta record
({"meta": true, "arms": [...], "seeds": N}) written by FuzzDdlDump from
the live FuzzDdl.armNames — every listed arm must appear in the replayed
histogram, so a dump produced by a stale compile (fewer arms than the
source grammar) fails loudly instead of passing silently. A dump with no
meta line is rejected unless --expected-arms a,b,c is given explicitly.

Usage: python3 tools/fuzz_ddl_duck_check.py <dump.jsonl> [report.json]
           [--expected-arms a,b,c]

Exit 0 on full agreement AND full arm coverage; exit 1 otherwise.
"""
import json
import sys
from collections import Counter
from decimal import Decimal

import duckdb


def canon_value(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return "%.6f" % v
    if isinstance(v, Decimal):
        return "%.6f" % float(v)
    return str(v)


def canon_rows(rows):
    return sorted("|".join(canon_value(v) for v in r) for r in rows)


def main():
    argv = list(sys.argv[1:])
    expected_arms = None
    if "--expected-arms" in argv:
        i = argv.index("--expected-arms")
        expected_arms = [a for a in argv[i + 1].split(",") if a]
        del argv[i:i + 2]
    dump = argv[0] if argv else "/tmp/fuzz_ddl.jsonl"
    report_path = argv[1] if len(argv) > 1 else None

    arms = Counter()
    mismatches = []
    errors = []
    n = 0
    nonempty = 0
    refusal_checks = 0
    for line in open(dump):
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        if rec.get("meta"):
            if expected_arms is None:
                expected_arms = rec["arms"]
            continue
        n += 1
        arms[rec["arm"]] += 1
        con = duckdb.connect()  # fresh session per seed
        try:
            for stmt in rec["setup"]:
                con.sql(stmt)
            # refusal contract (null_guard arm): each statement must
            # RAISE in DuckDB too (NOT NULL constraint); runs before the
            # final compare so a partial write would surface as a row
            # diff as well
            for stmt in rec.get("refusals", []):
                refusal_checks += 1
                refused = False
                try:
                    con.sql(stmt)
                except Exception:  # noqa: BLE001 - refusal IS the pass
                    refused = True
                if not refused:
                    mismatches.append({
                        "seed": rec["seed"], "arm": rec["arm"],
                        "check": "refusal",
                        "engine_rows": -1, "duck_rows": -1,
                        "engine_only": [], "duck_only": [],
                        "sql": stmt})
            checks = [("final", rec["final_sql"], rec["rows"])]
            if rec.get("final_sql2") is not None:
                checks.append(("collapse", rec["final_sql2"], rec["rows2"]))
            for label, q, want_raw in checks:
                got = canon_rows(con.sql(q).fetchall())
                want = sorted(want_raw)
                if want:
                    nonempty += 1
                if got != want:
                    mismatches.append({
                        "seed": rec["seed"], "arm": rec["arm"],
                        "check": label,
                        "engine_rows": len(want), "duck_rows": len(got),
                        "engine_only": [r for r in want if r not in got][:3],
                        "duck_only": [r for r in got if r not in want][:3],
                        "sql": q})
        except Exception as e:  # noqa: BLE001 - report and continue
            errors.append({"seed": rec["seed"], "arm": rec["arm"],
                           "error": str(e).split("\n")[0]})
        finally:
            con.close()

    if expected_arms is None:
        print("FAIL: dump has no meta line and --expected-arms was not "
              "given — cannot verify arm coverage; re-run FuzzDdlDump "
              "from a fresh compile")
        sys.exit(1)
    # arms cycle (seed-1) % len(arms), so a dump of n < len(arms) seeds
    # can only ever reach the first n arms — bound the expectation so a
    # fresh smoke-run dump isn't misreported as stale
    reachable = expected_arms[:n] if n < len(expected_arms) else expected_arms
    if len(reachable) < len(expected_arms):
        print(f"NOTE: only {n} seeds — coverage provable for the first "
              f"{len(reachable)} of {len(expected_arms)} arms")
    missing_arms = [a for a in reachable if a not in arms]
    ok = not mismatches and not errors and not missing_arms
    print(f"== fuzz-ddl-duck: {n} seeds, {nonempty} non-empty checks, "
          f"{refusal_checks} refusal checks, "
          f"{len(mismatches)} mismatches, {len(errors)} duck errors, "
          f"{len(arms)}/{len(reachable)} reachable arms covered ==")
    if missing_arms:
        print(f"FAIL: arms never replayed (stale dump?): "
              f"{', '.join(missing_arms)}")
    for m in mismatches[:5]:
        print(f"seed {m['seed']} ({m['arm']}, {m['check']}): engine "
              f"{m['engine_rows']} rows vs DuckDB {m['duck_rows']}\n"
              f"  sql: {m['sql']}\n  engine-only: {m['engine_only']}\n"
              f"  duck-only: {m['duck_only']}")
    for e in errors[:5]:
        print(f"seed {e['seed']} ({e['arm']}) DUCK ERROR: {e['error']}")
    if report_path:
        json.dump({
            "seeds": n, "non_empty_checks": nonempty,
            "refusal_checks": refusal_checks,
            "provenance_note": (
                "r12 sweep: 23-arm grammar (null_guard added -- "
                "NULL-into-non-Nullable writes must RAISE in both "
                "engines; refusal_checks counts the replayed attempts), "
                "fresh-compile dump with the meta-header arm assertion; "
                "the r10 stale-dump incident and its r11 remediation "
                "are recorded in SURVEY §8's DDL fuzz gate row"),
            "expected_arms": expected_arms,
            "missing_arms": missing_arms,
            "arms": dict(sorted(arms.items())),
            "mismatches": mismatches, "duck_errors": errors,
            "agreement": ok,
        }, open(report_path, "w"), indent=1)
        print(f"report -> {report_path}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
