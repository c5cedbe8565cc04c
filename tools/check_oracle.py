#!/usr/bin/env python3
"""Dev-only local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (engine result), runs the
matching oracle SQL from oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, sorts columns by name + rows by all columns, and
compares values exactly. NOT part of the shipped engine (Scala).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, float):
                # match on repr; NaN normalized
                r.append("nan" if math.isnan(v) else repr(v))
            else:
                r.append(str(v))
        out.append(tuple(r))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    per_query = {}
    for name in sorted(oracle):
        res_dir = Path(out_dir, name)
        if not res_dir.exists():
            print(f"FAIL {name}: no engine output")
            per_query[name] = "fail:no_output"
            n_fail += 1
            continue
        try:
            got_rel = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'")
            got_cols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
            exp_rel = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:  # noqa: BLE001 — record, keep checking the rest
            print(f"FAIL {name}: oracle error: {e}")
            per_query[name] = "fail:oracle_error"
            n_fail += 1
            continue
        # sort columns by name (driver contract)
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            per_query[name] = "fail:columns"
            n_fail += 1
            continue
        g = canon([[r[i] for i in gi] for r in got])
        e = canon([[r[i] for i in ei] for r in exp])
        if g == e:
            print(f"PASS {name} ({len(g)} rows)")
            per_query[name] = "pass"
            n_pass += 1
        else:
            n_fail += 1
            per_query[name] = "fail:rows"
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            for a, b in diff:
                print(f"   engine: {a}\n   oracle: {b}")
            if len(g) != len(e):
                only_g = set(g) - set(e)
                only_e = set(e) - set(g)
                for r in list(only_g)[:2]:
                    print(f"   only-engine: {r}")
                for r in list(only_e)[:2]:
                    print(f"   only-oracle: {r}")
    print(f"== {n_pass} pass, {n_fail} fail")
    # fail-closed proof for the q33/q43 SEMI-oracles (they re-read the
    # engine's emitted ids, so the tamper harness must show every known
    # bad-emission mode diverges the oracle's row count). One summary
    # line lands in semioracle.txt next to bench.json so each round
    # commits a concrete artifact of the property.
    import subprocess
    semi = subprocess.run(
        [sys.executable, str(Path(__file__).with_name("check_semioracle.py")),
         sf_dir, out_dir], capture_output=True, text=True)
    semi_line = (semi.stdout.strip().splitlines() or ["no output"])[-1]
    print(f"semioracle: {semi_line} (exit {semi.returncode})")
    # Only a SUCCESSFUL proof run may (over)write the committed
    # artifact: a subset Verify dump (q33/q43 absent) crashes the
    # tamper harness with "no output (exit 1)", and writing that would
    # clobber the fail-closed proof the round is supposed to carry.
    if semi.returncode == 0:
        try:
            Path("semioracle.txt").write_text(f"{semi_line} (exit 0)\n")
        except OSError as e:
            print(f"could not write semioracle.txt: {e}")
        # committed per-round oracle artifact (r18 verdict ask #6: the
        # driver's CORRECTNESS_r18.json arrived empty and the repo had
        # no backstop of its own). Gated on the same full-run proof as
        # semioracle.txt: a subset Verify dump crashes the tamper
        # harness, so a subset run can never clobber the committed
        # full-battery record.
        try:
            Path("oracle_check.json").write_text(json.dumps(
                {"n_pass": n_pass, "n_fail": n_fail,
                 "n_queries": n_pass + n_fail,
                 "fail": sorted(k for k, v in per_query.items()
                                if v != "pass"),
                 "queries": per_query},
                indent=0, sort_keys=True) + "\n")
        except OSError as e:
            print(f"could not write oracle_check.json: {e}")
    else:
        print("semioracle FAILED -- leaving committed semioracle.txt untouched")
    sys.exit(1 if n_fail or semi.returncode else 0)


if __name__ == "__main__":
    main()
