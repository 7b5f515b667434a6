#!/usr/bin/env python3
"""Driver-hash-parity sweep: a STRICTER stand-in than check.py.

check.py fetches DuckDB results with fetchall() (native Python objects:
HUGEINT -> int, DECIMAL -> Decimal), which hides type-rendering
divergences a pandas/arrow-based driver harness would see (HUGEINT ->
float64, DECIMAL -> object/float).  This tool fetches BOTH sides the
pandas way — the Spark parquet via pyarrow -> pandas, the DuckDB oracle
via .df() — canonicalizes per-cell with the same rules as check.py, and
reports any query whose hash differs.  A query green here AND in
check.py is green under both fetch disciplines, so whatever the driver
uses, the rendered values agree.

Usage: python3 tools/hashcheck.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob, math, hashlib
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    # numpy scalars -> python
    if hasattr(v, "item") and not isinstance(v, (bytes, bytearray)):
        try:
            v = v.item()
        except Exception:
            pass
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon(x) for x in v) + "]"
    if v is pd.NaT:
        return "NULL"
    # DATE normalization: duckdb .df() renders DATE as datetime64 (midnight)
    # while arrow date32 -> datetime.date.  The driver is green on every
    # date-emitting query (r8), so this is a fetch-path artifact, not a
    # divergence; render tz-naive midnight datetimes in date form.
    import datetime as _dt
    if isinstance(v, _dt.datetime) and v.tzinfo is None and \
            (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
        return v.date().isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def df_lines(df):
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append("|".join(canon(v) for v in row))
    return sorted(out)


def table_hash(lines):
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Spark-written fixture dirs (ScaleUp/BenignCorpus) need a glob;
        # driver testdata stays a single file
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"EMPTY  {name}"); n_fail += 1
            continue
        got = pq.ParquetDataset(files).read().to_pandas()
        if name not in oracles:
            n_skip += 1
            if len(got) == 0:
                print(f"ROWS=0 {name}"); n_fail += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL   {name}: oracle SQL error: {e}"); n_fail += 1
            continue
        problems = []
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if not problems:
            l1, l2 = df_lines(got), df_lines(exp)
            if table_hash(l1) != table_hash(l2):
                problems.append("hash mismatch")
                for a, b in zip(l1, l2):
                    if a != b:
                        problems.append(f"first diff:\n  spark: {a}\n  duck:  {b}")
                        break
                # surface dtype divergence explicitly
                dg = {c: str(got[c].dtype) for c in sorted(got.columns)}
                de = {c: str(exp[c].dtype) for c in sorted(exp.columns)}
                dd = {c: (dg[c], de[c]) for c in dg if dg.get(c) != de.get(c)}
                if dd:
                    problems.append(f"dtype diff: {dd}")
        if problems:
            print(f"FAIL   {name}: " + "; ".join(problems)); n_fail += 1
        else:
            print(f"PASS   {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
