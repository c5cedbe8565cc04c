#!/usr/bin/env python3
"""Fail-closed validation for the q33/q43 SEMI-oracles.

The semi-oracles read the engine's own emitted ids back from the
Verify dump, so a naive version would be circular: any emitted id set
would hash-match itself. The hardened SQL encodes the selection
invariants (DISTINCT, self-exclusion, canonical pair order, threshold,
k guard) so that a bad emission SHRINKS the oracle's result and
surfaces as a driver row-count mismatch. This script proves that
property mechanically: it tampers a copy of the dump in every known
failure mode and asserts the oracle's row count diverges from the
tampered dump's.

Usage: tools/check_semioracle.py <sf_dir> <verify_out_dir>
(run tools/check_oracle.py or graft.Verify first to produce the dump)
"""
import glob
import json
import os
import shutil
import sys
import tempfile

import duckdb
import pandas as pd


def main():
    sf_dir, vout = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(vout, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')")
    tamper_root = tempfile.mkdtemp(prefix="graft-semioracle-")
    failures = []

    def scenario(name, query, frame):
        """Write `frame` as the tampered dump; PASS iff oracle rows != frame rows."""
        d = os.path.join(tamper_root, query)
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        frame.to_parquet(os.path.join(d, "part.parquet"), index=False)
        sql = oracle[query].replace(os.path.abspath(vout), tamper_root)
        got = len(con.execute(sql).fetchdf())
        caught = got != len(frame)
        print(f"{'PASS' if caught else 'FAIL'} {query}/{name}: "
              f"tampered rows {len(frame)} vs oracle rows {got}")
        if not caught:
            failures.append(f"{query}/{name}")

    q33 = pd.read_parquet(glob.glob(os.path.join(vout, "q33_ann_lsh"))[0])
    scenario("self_inclusion", "q33_ann_lsh",
             pd.concat([q33, q33.iloc[[0]].assign(vec_id=0)]))
    scenario("duplicate_id", "q33_ann_lsh",
             pd.concat([q33, q33.iloc[[0]]]))
    far_id = int(q33["vec_id"].max()) + 1
    scenario("k_overrun", "q33_ann_lsh",
             pd.concat([q33, q33.iloc[[0]].assign(vec_id=far_id)]))

    q43 = pd.read_parquet(glob.glob(os.path.join(vout, "q43_lsh_neardup"))[0])
    flipped = q43.iloc[[0]].copy()
    flipped["vec_a"], flipped["vec_b"] = (
        flipped["vec_b"].values, flipped["vec_a"].values)
    scenario("noncanonical_order", "q43_lsh_neardup",
             pd.concat([q43, flipped]))
    scenario("duplicate_pair", "q43_lsh_neardup",
             pd.concat([q43, q43.iloc[[0]]]))
    below = pd.DataFrame(
        {"vec_a": [1], "vec_b": [2], "cosine": [0.1]})
    scenario("below_threshold", "q43_lsh_neardup",
             pd.concat([q43, below.astype(q43.dtypes.to_dict())]))

    shutil.rmtree(tamper_root, ignore_errors=True)
    if failures:
        print(f"== {len(failures)} tamper scenario(s) NOT caught: {failures}")
        sys.exit(1)
    print("== all tamper scenarios caught (semi-oracles fail closed)")


if __name__ == "__main__":
    main()
