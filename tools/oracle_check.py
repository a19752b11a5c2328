#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]

<verifyOutDir> is what `graft.Verify <sfDir> <outDir>` wrote: one parquet dir
per query plus oracle_sql.json. For each query (default: all with an oracle)
this registers the sf tables in DuckDB, runs the oracle SQL, loads the Spark
dump, and compares row count, column names and exact cell values.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd


def load_spark(qdir: Path) -> pd.DataFrame:
    files = sorted(qdir.glob("*.parquet"))
    if not files:
        raise RuntimeError(f"no parquet under {qdir}")
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat()
    return str(v)


def frame_cells(df: pd.DataFrame):
    out = []
    for row in df.itertuples(index=False, name=None):
        out.append(tuple(canon(x) for x in row))
    return out


def main():
    sf = Path(sys.argv[1])
    out = Path(sys.argv[2])
    only = set(sys.argv[3:])
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in sf.glob("*.parquet"):
        con.execute(
            f"CREATE VIEW {t.stem} AS SELECT * FROM read_parquet('{t}')")
    failures = 0
    for name in sorted(oracle):
        if only and not any(name.startswith(o) for o in only):
            continue
        qdir = out / name
        if not qdir.is_dir():
            print(f"{name}: SKIP (no spark dump)")
            continue
        try:
            odf = con.execute(oracle[name]).df()
            sdf = load_spark(qdir)
        except Exception as e:
            print(f"{name}: ERROR {e}")
            failures += 1
            continue
        ok_rows = len(odf) == len(sdf)
        ok_cols = [c.lower() for c in odf.columns] == [
            c.lower() for c in sdf.columns]
        ok_vals = False
        detail = ""
        if ok_rows and ok_cols:
            oc, sc = frame_cells(odf), frame_cells(sdf)
            # oracle SQL mostly carries ORDER BY; some (q12) do not — compare
            # as multisets then (the driver hashes sorted frames)
            if oc == sc or sorted(oc) == sorted(sc):
                ok_vals = True
            else:
                for i, (a, b) in enumerate(zip(sorted(oc), sorted(sc))):
                    if a != b:
                        detail = f" first diff at sorted row {i}:\n  oracle={a}\n  spark ={b}"
                        break
        else:
            detail = (f" rows oracle={len(odf)} spark={len(sdf)};"
                      f" cols oracle={list(odf.columns)} spark={list(sdf.columns)}")
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name}: {status} ({len(sdf)} rows){detail}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
