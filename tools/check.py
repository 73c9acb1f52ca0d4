#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not engine code).

Runs DuckDB on each SparkEntry.oracleSql entry over the sf tables and
compares against the parquet that `graft.Verify` dumped: sort columns by
name, sort rows, compare values. Usage:

    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys

import duckdb
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    # NO array handling on purpose: the DRIVER's gate raises "unhashable
    # type: numpy.ndarray" on array cells (round-2 lesson — a local
    # tuple-ize patch here masked two driver failures). An array-typed
    # oracled column must fail loudly here too.
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     (getattr(v, "ndim", 0) == 1 and not isinstance(v, str))).any():
            raise TypeError(
                f"array-typed oracled column {c!r} — would err in the "
                "driver gate; canonicalize to a string on both engines")
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = norm(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            exp = norm(con.sql(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: load error {e}")
            n_fail += 1
            continue
        status = []
        if list(got.columns) != list(exp.columns):
            status.append(f"cols spark={list(got.columns)} duck={list(exp.columns)}")
        elif len(got) != len(exp):
            status.append(f"rows spark={len(got)} duck={len(exp)}")
        else:
            for c in got.columns:
                a, b = got[c], exp[c]
                # The driver hashes TYPED values, so 0 (int64) != 0.0
                # (float64) there even though numpy == says equal — the
                # round-4 doc_pack lesson (DuckDB sum(BIGINT) -> HUGEINT ->
                # pandas float64). Mirror that strictness: int-vs-float
                # dtype mismatch is a failure regardless of values.
                int_f = (pd.api.types.is_integer_dtype(a) and
                         pd.api.types.is_float_dtype(b))
                f_int = (pd.api.types.is_float_dtype(a) and
                         pd.api.types.is_integer_dtype(b))
                if int_f or f_int:
                    status.append(
                        f"col {c}: dtype mismatch spark={a.dtype} "
                        f"duck={b.dtype} (driver hashes typed values; "
                        "CAST the oracle side)")
                    continue
                try:
                    eq = (a.values == b.values) | (a.isna().values & b.isna().values)
                except Exception:  # noqa: BLE001
                    eq = a.astype(str).values == b.astype(str).values
                bad = (~eq).nonzero()[0] if hasattr(eq, "nonzero") else []
                if len(bad) > 0:
                    i = bad[0]
                    status.append(
                        f"col {c}: {len(bad)}/{len(a)} differ, first@{i}: "
                        f"spark={a.iloc[i]!r} duck={b.iloc[i]!r}")
        if status:
            print(f"FAIL {name}: " + "; ".join(status[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
