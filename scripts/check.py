#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <out_dir>/oracle_sql.json in DuckDB against the sf_dir
parquet tables, and compares: columns sorted by name, rows sorted by all
columns, values compared exactly (floats to 1e-9 relative).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # lists -> tuples so they sort/compare
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def compare(name, got: pd.DataFrame, exp: pd.DataFrame) -> str:
    if sorted(got.columns) != sorted(exp.columns):
        return f"SCHEMA got={sorted(got.columns)} exp={sorted(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWS got={len(got)} exp={len(exp)}"
    g, e = norm(got), norm(exp)
    for c in g.columns:
        gv, ev = g[c], e[c]
        if pd.api.types.is_float_dtype(gv) and pd.api.types.is_float_dtype(ev):
            both_nan = gv.isna() & ev.isna()
            ok = both_nan | np.isclose(gv.fillna(0), ev.fillna(0), rtol=1e-9, atol=1e-12)
        else:
            try:
                ok = (gv == ev) | (gv.isna() & ev.isna())
            except Exception:
                ok = gv.astype(str) == ev.astype(str)
        if not ok.all():
            i = int(np.argmin(ok.values))
            return f"VALUE col={c} row={i} got={gv.iloc[i]!r} exp={ev.iloc[i]!r} (nbad={int((~ok).sum())})"
    return "OK"

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    arrow_tables = {}  # keep registered pyarrow tables alive for the run
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        # shape latitude (mirrors Engine.table): a table may arrive as a
        # single file, a flat multi-file directory, or a hive-partitioned
        # directory (key=value subdirs). DuckDB 1.0's hive_partitioning
        # does NOT url-unescape partition values ('Brand#12' reads back
        # 'Brand%2312' while Spark unescapes — the q13/q32 rehearsal
        # catch), so directory shapes go through pyarrow, which both
        # unescapes and type-infers partition columns like Spark does.
        if os.path.isdir(p):
            import pyarrow.parquet as pq_mod
            tbl = pq_mod.read_table(p)
            # partition columns come back dictionary-encoded; flatten to
            # their value type so DuckDB/pandas compare as plain values
            for i, f in enumerate(tbl.schema):
                import pyarrow as pa_mod
                if pa_mod.types.is_dictionary(f.type):
                    tbl = tbl.set_column(
                        i, f.name, tbl.column(i).cast(f.type.value_type))
            arrow_tables[t] = tbl
            con.register(f"{t}_arrow", tbl)
            src = f"{t}_arrow"
        else:
            src = f"read_parquet('{p}')"
        # string-annotation latitude (mirrors Engine.utf8Strings): the
        # TESTDATA contract has no binary columns, so a BLOB here is a
        # string whose writer dropped parquet's UTF8 annotation — decode
        # it so the oracle SQL's string ops keep working
        cols = con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
        blobs = [c[0] for c in cols if c[1] == "BLOB"]
        sel = ("*" if not blobs else
               "* REPLACE (" + ", ".join(f'decode("{c}") AS "{c}"' for c in blobs) + ")")
        con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM {src}")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = [n for n in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, n))]
    n_ok = n_bad = n_skip = 0
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"{name:28s} NO-OUTPUT"); n_bad += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            status = "ROWS-ONLY " + ("OK" if len(got) > 0 else "EMPTY!")
            print(f"{name:28s} {status}")
            n_skip += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as ex:
            print(f"{name:28s} ORACLE-SQL-ERROR {str(ex).splitlines()[0]}")
            n_bad += 1; continue
        r = compare(name, got, exp)
        print(f"{name:28s} {r}")
        if r == "OK": n_ok += 1
        else: n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {n_skip} rows-only")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
