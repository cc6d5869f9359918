#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Runs DuckDB oracle SQL against the same parquet tables and compares
with the Spark results dumped by graft.Verify. Sorts columns by name,
sorts rows, compares values (exact, with a small FP report).

Usage: tools/parity.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        # decimal.Decimal etc -> float for comparison
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        if os.path.isdir(p) or os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
            # events.ts is TIMESTAMP(NANOS) in the driver-written file
            # but raw int64 nanos in Spark-written copies (ScaleTables
            # keeps it so Tables.events reads both identically) —
            # normalize to the µs TIMESTAMP the oracles expect, the
            # same DIV-1000 truncation Tables.events applies
            if t == "events":
                (_, ts_type) = [r[:2] for r in con.sql("DESCRIBE events")
                                .fetchall() if r[0] == "ts"][0]
                if ts_type == "BIGINT":
                    con.execute(
                        f"CREATE OR REPLACE VIEW {t} AS SELECT * REPLACE "
                        f"(make_timestamp(ts // 1000) AS ts) FROM '{src}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # --skip a,b,c: exclude named queries (e.g. the full-corpus cosine
    # CTEs, whose interpreted DuckDB lambdas are ~1000x slower than the
    # codegen'd Spark side and become impractical at 10x scale)
    skip, only, json_out = set(), None, None
    for arg in sys.argv[3:]:
        if arg.startswith("--skip="):
            skip |= set(arg.split("=", 1)[1].split(","))
        elif arg.startswith("--only="):
            only = (only or set()) | set(arg.split("=", 1)[1].split(","))
        elif arg.startswith("--json="):
            json_out = arg.split("=", 1)[1]
        else:
            sys.exit(f"unknown argument {arg!r} (use --skip=a,b / --only=a,b / --json=path)")
    n_pass = n_fail = 0
    results = {}  # driver-shaped per-query records (--json)
    for name in sorted(oracles):
        if name in skip or (only is not None and name not in only):
            continue
        sql = oracles[name]
        spark_path = f"{out_dir}/{name}"
        if not glob.glob(f"{spark_path}/*.parquet"):
            print(f"FAIL {name}: no spark output"); n_fail += 1
            results[name] = dict(err="no_spark_output", hash_match=False,
                rows_match=None, schema_match=None, spark_rows=None,
                oracle_rows=None)
            continue
        try:
            oracle = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1
            results[name] = dict(err=f"oracle_error: {e}", hash_match=None,
                rows_match=None, schema_match=None, spark_rows=None,
                oracle_rows=None)
            continue
        got = pd.read_parquet(spark_path)
        o, g = norm(oracle), norm(got)
        results[name] = dict(err=None, rows_match=len(o) == len(g),
            schema_match=list(o.columns) == list(g.columns),
            hash_match=False, spark_rows=len(g), oracle_rows=len(o))
        if list(o.columns) != list(g.columns):
            print(f"FAIL {name}: cols oracle={list(o.columns)} got={list(g.columns)}")
            n_fail += 1; continue
        if len(o) != len(g):
            print(f"FAIL {name}: rows oracle={len(o)} got={len(g)}"); n_fail += 1; continue
        bad = []
        for c in o.columns:
            ov, gv = o[c].values, g[c].values
            # Driver hashes serialized values: 99111.0 != 99111. A float-vs-int
            # dtype mismatch WILL fail the driver's hash even if values match.
            of, gf = pd.api.types.is_float_dtype(o[c]), pd.api.types.is_float_dtype(g[c])
            oi, gi = pd.api.types.is_integer_dtype(o[c]), pd.api.types.is_integer_dtype(g[c])
            if (of and gi) or (oi and gf):
                bad.append(f"{c}: DTYPE oracle={o[c].dtype} got={g[c].dtype} (driver hash would differ)")
                continue
            if of or gf:
                ovf = ov.astype(float); gvf = gv.astype(float)
                eq = (ovf == gvf) | (pd.isna(ovf) & pd.isna(gvf))
                if not eq.all():
                    i = int(np.flatnonzero(~eq)[0])
                    bad.append(f"{c}[{i}]: oracle={ovf[i]!r} got={gvf[i]!r} diff={abs(ovf[i]-gvf[i])}")
            else:
                oo = pd.Series(ov).astype(str); gg = pd.Series(gv).astype(str)
                eq = (oo == gg).values
                if not eq.all():
                    i = int(np.flatnonzero(~eq)[0])
                    bad.append(f"{c}[{i}]: oracle={ov[i]!r} got={gv[i]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:3])); n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
            results[name]["hash_match"] = True
    # queries with no oracle -> rows-only
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{d}") and d not in oracles:
            n = len(pd.read_parquet(f"{out_dir}/{d}"))
            print(f"ROWS {d}: {n} rows (no oracle)")
            results[d] = dict(err="no_oracle", hash_match=None,
                rows_match=None, schema_match=None, spark_rows=n,
                oracle_rows=None)
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        json.dump({k: results[k] for k in sorted(results)},
                  open(json_out, "w"), indent=1, sort_keys=True)
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
