#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle correctness gate.

Dev tooling only (not part of the Scala library). Usage:
    python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
Reads outDir/<name>/ parquet (written by graft.Verify) and outDir/
oracle_sql.json, runs each SQL in DuckDB with the sf tables registered as
views, and compares canonically: columns sorted by name, rows sorted, floats
compared by EXACT shortest round-trip repr — bit-identical or FAIL, the same
bar the driver's hash applies. (Round 6 proved any tolerance here is a
fidelity hole: a 10-sig-digit compare rendered Spark's 3024008727.84 and
DuckDB's 3024008727.81 both as "3024008728", so q148 passed locally and
failed the driver. The engine's Rounding/integer-cents discipline is
supposed to make outputs bit-identical; the local gate now checks exactly
that claim.)

Driver fidelity: the driver canonicalizes through pandas, where DuckDB
HUGEINT (e.g. sum() over integers) becomes float64 and hashes `123.0`
against Spark's int64 `123`. We mirror that by comparing each common
column's pandas dtype *kind* (int vs float) via .df() — a mismatch is a
FAIL even when the repr-normalized values agree.
"""
import json
import math
import sys

import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rel):
    """Canonicalize a DuckDB relation THROUGH pandas, the way the driver's
    hasher does: columns sorted by name, then DataFrame.sort_values over
    ALL columns. The sort_values call is the fidelity point — array-typed
    cells (numpy.ndarray) crash pandas' lexsort exactly like they crash
    the driver (round-5 q112), so an unsortable output fails HERE first.
    After the pandas sort we normalize values for the bit-exact compare
    (shortest round-trip float repr)."""
    df = rel.df()
    cols = sorted(df.columns)
    df = df[cols]
    # raises on ndarray cells — intentionally NOT caught here
    df.sort_values(by=cols)

    def norm(v):
        if v is None:
            return "None"
        if isinstance(v, (float, np.floating)):
            if math.isnan(v):
                return "nan"
            return repr(float(v))
        if isinstance(v, (int, np.integer)):
            return repr(int(v))
        if isinstance(v, np.ndarray):
            return "[" + ",".join(norm(x) for x in v.tolist()) + "]"
        if isinstance(v, list):
            return "[" + ",".join(norm(x) for x in v) + "]"
        if v != v:  # pandas NaT (scalars only reach here)
            return "None"
        return repr(v)

    return sorted(tuple(norm(v) for v in row)
                  for row in df.itertuples(index=False, name=None))


def dtype_mismatches(got_df, exp_df):
    """Columns whose pandas numeric kind differs (int-vs-float), as the
    driver's hasher would see them. Kinds outside {i,u,f} are ignored —
    strings/lists/timestamps already compare by value."""
    bad = []
    for c in got_df.columns:
        if c not in exp_df.columns:
            continue
        gk, ek = got_df[c].dtype.kind, exp_df[c].dtype.kind
        if gk in "iuf" and ek in "iuf" and (gk in "iu") != (ek in "iu"):
            bad.append(f"{c}: spark {got_df[c].dtype} vs oracle {exp_df[c].dtype}")
    return bad


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got = canon(got_rel)
            exp_rel = con.sql(sql)
            exp = canon(exp_rel)
            bad_types = dtype_mismatches(
                con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df(),
                con.sql(sql).df())
            if sorted(got_rel.columns) != sorted(exp_rel.columns):
                print(f"FAIL {name}: columns {sorted(got_rel.columns)} "
                      f"vs oracle {sorted(exp_rel.columns)}")
                n_bad += 1
            elif bad_types:
                print(f"FAIL {name}: dtype mismatch {bad_types}")
                n_bad += 1
            elif got == exp:
                print(f"ok   {name} ({len(got)} rows)")
                n_ok += 1
            else:
                n_bad += 1
                print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
                diff_g = [r for r in got if r not in set(map(tuple, exp))][:3]
                diff_e = [r for r in exp if r not in set(map(tuple, got))][:3]
                print(f"     spark-only: {diff_g}")
                print(f"     oracle-only: {diff_e}")
        except Exception as e:  # noqa: BLE001
            n_bad += 1
            print(f"ERR  {name}: {e}")
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
