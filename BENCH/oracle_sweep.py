"""Driver-style oracle sweep: run every __ray_entry__.queries() entry at
sf0.01 and compare to its oracle_sql() via DuckDB the way the driver does
(sort columns by name, sort rows, compare values; floats via allclose).

Usage: PYTHONPATH=/root/repo python BENCH/oracle_sweep.py [sf_dir]
Prints one line per query and a FAIL summary; exit status is 0 even on
failures (read the SUMMARY line) so partial sweeps stay inspectable."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False)
import importlib.util
spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
mod = importlib.util.module_from_spec(spec)
sys.modules["__ray_entry__"] = mod
spec.loader.exec_module(mod)

import duckdb
import pandas as pd
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs = mod.queries()
oracles = mod.oracle_sql()
results = {}
for name, fn in qs.items():
    t0 = time.time()
    rec = {"err": None}
    try:
        out = fn(SF)
        if hasattr(out, "to_pandas"):
            df = out.to_pandas()
        elif isinstance(out, pd.DataFrame):
            df = out
        else:  # ray Dataset
            df = out.to_pandas()
        rec["spark_rows"] = len(df)
        if name in oracles:
            odf = con.execute(oracles[name]).fetchdf()
            rec["oracle_rows"] = len(odf)
            rec["rows_match"] = len(df) == len(odf)
            a = df[sorted(df.columns)]
            b = odf[sorted(odf.columns)]
            rec["schema_match"] = list(a.columns) == list(b.columns)
            if rec["rows_match"] and rec["schema_match"]:
                a = a.sort_values(by=list(a.columns), ignore_index=True)
                b = b.sort_values(by=list(b.columns), ignore_index=True)
                ok = True
                for c in a.columns:
                    av, bv = a[c].to_numpy(), b[c].to_numpy()
                    try:
                        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                            # INTENTIONALLY exact (rtol=atol=0): every
                            # registered query keeps accumulations
                            # integer-only / bit-deterministic precisely so
                            # the driver's hash compare passes — a float
                            # mismatch here means that invariant broke, and
                            # this diagnostic must be STRICTER than the
                            # driver, never looser (ADVICE r03 noted the
                            # strictness; it is the point)
                            col_ok = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
                        else:
                            col_ok = (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).all()
                    except Exception as e:
                        col_ok = False
                    if not col_ok:
                        ok = False
                        rec["first_bad_col"] = c
                        break
                rec["hash_match"] = bool(ok)
            else:
                rec["hash_match"] = False
        else:
            rec["oracle"] = "rows_only"
    except Exception as e:
        rec["err"] = f"{type(e).__name__}: {e}"[:200]
    rec["secs"] = round(time.time() - t0, 2)
    results[name] = rec
    bad = rec.get("err") or (name in oracles and not rec.get("hash_match"))
    print(("FAIL " if bad else "ok   ") + name, rec, flush=True)

fails = {k: v for k, v in results.items() if v.get("err") or (k in oracles and not v.get("hash_match"))}
print("\n=== SUMMARY:", len(results), "queries,", len(fails), "failures")
for k, v in fails.items():
    print("FAIL:", k, v)
ray.shutdown()
