#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dir in
OUT (written by graft.Verify), run the corresponding oracle SQL from
oracle_sql.json in DuckDB over the sf parquet tables, sort columns by
name and rows by all columns, and compare values.

Usage: python3 tools/compare.py /tmp/verify_out /root/testdata/sf0.01 \
           [CORRECTNESS-style-artifact.json]

With the optional third arg, also writes a driver-format artifact
({q: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}}) so scale-fixture runs (e.g. /tmp/sf1_real) leave the same
evidence shape the per-round gate produces.
"""
import json, sys, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(out_dir, sf_dir, json_out=None):
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata is one file per table; Spark-written scale
        # fixtures (tools/gen_sf1_real.scala) are part-file directories
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    counts = {}  # name -> (spark_rows, oracle_rows-or-None)
    for qdir in sorted(glob.glob(f"{out_dir}/q_*")):
        name = qdir.split("/")[-1]
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        spark_df = pq.read_table(files[0]).to_pandas()
        counts[name] = (len(spark_df), None)
        if name not in oracles:
            results[name] = f"no_oracle rows={len(spark_df)}"
            continue
        try:
            ora_df = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        counts[name] = (len(spark_df), len(ora_df))
        if len(spark_df) != len(ora_df):
            results[name] = f"ROWS {len(spark_df)} vs {len(ora_df)}"
            continue
        s_cols, o_cols = sorted(spark_df.columns), sorted(ora_df.columns)
        if s_cols != o_cols:
            results[name] = f"SCHEMA {s_cols} vs {o_cols}"
            continue
        s = spark_df[s_cols].sort_values(s_cols).reset_index(drop=True)
        o = ora_df[o_cols].sort_values(o_cols).reset_index(drop=True)
        diff = []
        for c in s_cols:
            sv, ov = s[c], o[c]
            try:
                import numpy as np
                # The driver's hash stringifies values, so an int column on one
                # side vs float on the other (e.g. DuckDB HUGEINT -> float64)
                # hash-mismatches even when values are identical. Flag it here
                # instead of silently taking the isclose path.
                if (sv.dtype.kind in "iu") != (ov.dtype.kind in "iu") and \
                        {sv.dtype.kind, ov.dtype.kind} & set("fc"):
                    diff.append(f"{c}:DTYPE({sv.dtype}vs{ov.dtype})")
                    continue
                if sv.dtype.kind in "fc" or ov.dtype.kind in "fc":
                    a = sv.astype(float).to_numpy()
                    b = ov.astype(float).to_numpy()
                    both_nan = np.isnan(a) & np.isnan(b)
                    exact = np.isclose(a, b, rtol=0, atol=0, equal_nan=True)
                    close = np.isclose(a, b, rtol=1e-9, atol=1e-12, equal_nan=True)
                    if not close.all():
                        diff.append(f"{c}:VALUES({(~close).sum()})")
                    elif not (exact | both_nan).all():
                        diff.append(f"{c}:FLOAT_ULP({(~(exact|both_nan)).sum()})")
                else:
                    a = sv.astype(str).to_numpy()
                    b = ov.astype(str).to_numpy()
                    if not (a == b).all():
                        diff.append(f"{c}:VALUES({(a != b).sum()})")
            except Exception as e:
                diff.append(f"{c}:CMP_ERR({e})")
        results[name] = "OK" if not diff else "DIFF " + ",".join(diff)
    n_ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        if v != "OK":
            print(f"{k}: {v}")
    print(f"\n{n_ok}/{len(results)} OK")
    if json_out:
        art = {}
        for k, v in sorted(results.items()):
            ok = v == "OK"
            sr, orr = counts.get(k, (None, None))
            # 'never checked' must be distinguishable from a real
            # mismatch: unchecked entries (missing oracle / oracle SQL
            # error) carry hash_match null + an explicit err marker,
            # not hash_match false.
            # ARTIFACT SCHEMA NOTE (r11 change): rows_match /
            # schema_match / hash_match are nullable booleans — null
            # means "not checked", and the explicit "checked" field
            # carries that tri-state so gate scripts can key off
            # checked/err instead of plain truthiness (before r11,
            # no_oracle entries reported rows_match/schema_match true).
            unchecked = v.startswith("no_oracle") or \
                v.startswith("ORACLE_SQL_ERROR") or v == "NO_SPARK_OUTPUT"
            art[k] = {
                "checked": not unchecked,
                "rows_match": None if unchecked
                    else ok or not v.startswith("ROWS"),
                "schema_match": None if unchecked
                    else ok or not v.startswith("SCHEMA"),
                "hash_match": None if unchecked else ok,
                "spark_rows": sr,
                "oracle_rows": orr,
                "err": None if ok else v}
        with open(json_out, "w") as f:
            json.dump(art, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else None)
