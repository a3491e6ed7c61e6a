#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
same parquet tables, and compares rows / schema / values. Values are compared
after sorting columns by name and sorting rows, mirroring the driver.
"""
import json
import sys
import threading
import time

import duckdb
import pandas as pd

# Per-oracle wall budget. The driver's DuckDB pass has a bounded overall
# budget (r8: one 10-minute oracle zeroed the whole round's artifact), so a
# single slow oracle must FAIL here loudly rather than pass slowly — the
# time-dimension twin of the HUGEINT type-strictness check below.
ORACLE_BUDGET_SEC = 30.0

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # naive timestamps for tz-insensitive compare; dates → ISO strings
    import datetime
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64[ns,"):
            df[c] = df[c].dt.tz_localize(None)
        if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, datetime.date)).any():
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        # normalize float-ish decimals
        if df[c].dtype == object:
            import decimal
            if df[c].map(lambda v: isinstance(v, decimal.Decimal)).any():
                df[c] = df[c].astype(float)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
            # Enforce the budget with a watchdog that interrupts a
            # PER-ORACLE cursor (a sibling connection to the same
            # database — views are shared); interrupting the shared
            # connection instead would race: a timer firing just after a
            # ~29.9 s fetch completes leaves the interrupt pending and
            # poisons the NEXT (fast) oracle. Materialize inside the
            # timed window (sql() is lazy — fetch is where the work is).
            cur = con.cursor()
            t0 = time.monotonic()
            watchdog = threading.Timer(ORACLE_BUDGET_SEC, cur.interrupt)
            watchdog.start()
            try:
                rel = cur.sql(sql)
            # The driver's value hash is TYPE-SENSITIVE. DuckDB silently
            # promotes SUM/list_sum over BIGINT to HUGEINT (INT128), which
            # pandas renders as float64 — values then compare equal here
            # while the driver's hash fails. Reject the promotion outright
            # so the oracle SQL must carry an explicit CAST.
                huge = [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
                        if str(t).upper() in ("HUGEINT", "UHUGEINT")]
                duck_raw = rel.df()
            except duckdb.InterruptException:
                n_fail += 1
                print(f"FAIL {name}: oracle exceeded {ORACLE_BUDGET_SEC:.0f}s "
                      f"budget (driver gate would time out) — hint chained "
                      f"CTEs with AS MATERIALIZED or simplify the SQL")
                continue
            finally:
                watchdog.cancel()
                cur.close()
            oracle_sec = time.monotonic() - t0
            duck_df = canon(duck_raw)
            problems = []
            if oracle_sec > ORACLE_BUDGET_SEC:
                problems.append(
                    f"oracle took {oracle_sec:.1f}s > {ORACLE_BUDGET_SEC:.0f}s budget")
            if huge:
                problems.append(
                    f"oracle emits INT128 (driver hash mismatch) — add "
                    f"CAST(... AS BIGINT): {huge}")
            # post-canon dtype-kind drift (e.g. int64 vs float64) is exactly
            # the class the driver hash distinguishes; fail it here too.
            for c in spark_df.columns:
                if c in duck_df.columns and \
                        spark_df[c].dtype.kind != duck_df[c].dtype.kind:
                    problems.append(
                        f"dtype drift {c}: spark {spark_df[c].dtype} vs "
                        f"oracle {duck_df[c].dtype}")
            if len(spark_df) != len(duck_df):
                problems.append(f"rows {len(spark_df)} vs {len(duck_df)}")
            if list(spark_df.columns) != list(duck_df.columns):
                problems.append(
                    f"cols {list(spark_df.columns)} vs {list(duck_df.columns)}")
            if not problems:
                try:
                    pd.testing.assert_frame_equal(
                        spark_df, duck_df, check_dtype=False,
                        check_exact=True)
                except AssertionError as e:
                    problems.append("values: " + str(e).split("\n")[0])
            if problems:
                n_fail += 1
                print(f"FAIL {name}: {'; '.join(problems)}")
            else:
                n_pass += 1
                slow = f" [{oracle_sec:.1f}s]" if oracle_sec > 5 else ""
                print(f"ok   {name} ({len(spark_df)} rows){slow}")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"FAIL {name}: exception {str(e)[:200]}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
