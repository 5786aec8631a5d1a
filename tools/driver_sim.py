"""Simulate the correctness driver: vanilla SparkSession (none of the
engine's confs), iterate ``__spark_entry__.queries()``, run each query at
sf0.01, hash-compare against ``oracle_sql()`` in DuckDB — the same
rows/schema/values contract as CORRECTNESS_r{N}.json.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def normalize(df):
    df = df[sorted(df.columns)].copy()
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), na_position="first").reset_index(
            drop=True
        )
    return df


def value_hash(df) -> str:
    import hashlib

    return hashlib.md5(
        df.astype(str).to_csv(index=False).encode()
    ).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    # Deliberately vanilla: mimic a driver session we don't control.
    spark = (
        SparkSession.builder.appName("driver-sim")
        .master("local[32]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    qs = entry.queries()
    # Rebuild fixture-backed oracles (f01/f03/f04/t10/...) against THIS
    # sf_dir: entry.oracle_sql() calls the lazy SQL builders with no
    # args, which embeds the sf0.01 default's fixture paths — running
    # the sim at any other sf would compare Spark-on-sf_dir against
    # DuckDB-on-sf0.01 fixtures and report false mismatches (round-6
    # review; same fix as chaos_partitions._oracle_parity).
    import inspect

    oracles: dict[str, str] = {}
    for mod in entry._modules():
        for name, sql in getattr(mod, "ORACLE", {}).items():
            if name not in qs:
                continue
            if callable(sql):
                params = inspect.signature(sql).parameters
                oracles[name] = sql(sf_dir) if "sf_dir" in params else sql()
            else:
                oracles[name] = sql
    # one connection + one view registration for the whole sweep
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    results: dict[str, dict] = {}
    for name in sorted(qs):
        if only and name not in only:
            continue
        rec: dict = {}
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            spdf = normalize(sdf.toPandas())
            rec["spark_rows"] = len(spdf)
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"spark: {type(exc).__name__}: {exc}"
            rec["trace"] = traceback.format_exc()[-2000:]
            results[name] = rec
            print(f"FAIL-SPARK {name} ({time.time()-t0:.1f}s): {rec['err']}")
            continue
        if name not in oracles:
            rec["err"] = "no_oracle"
            results[name] = rec
            print(f"no_oracle  {name} rows={rec['spark_rows']} ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = normalize(con.execute(oracles[name]).df())
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"oracle: {type(exc).__name__}: {exc}"
            results[name] = rec
            print(f"FAIL-ORA   {name} ({time.time()-t0:.1f}s): {rec['err']}")
            continue
        rec["rows_match"] = len(spdf) == len(odf)
        rec["schema_match"] = list(spdf.columns) == list(odf.columns)
        rec["hash_match"] = (
            rec["rows_match"]
            and rec["schema_match"]
            and value_hash(spdf) == value_hash(odf)
        )
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        status = "pass      " if ok else "MISMATCH  "
        print(
            f"{status} {name} rows={len(spdf)}/{len(odf)} "
            f"schema={rec['schema_match']} hash={rec['hash_match']} "
            f"({time.time()-t0:.1f}s)"
        )
        if not ok and rec["rows_match"] and rec["schema_match"]:
            # show first differing rows
            import pandas as pd

            for i in range(min(len(spdf), len(odf))):
                for c in spdf.columns:
                    a, b = spdf.iloc[i][c], odf.iloc[i][c]
                    if str(a) != str(b):
                        print(f"    first diff row {i} col {c}: spark={a!r} oracle={b!r}")
                        break
                else:
                    continue
                break
        results[name] = rec

    n_bad = sum(
        1
        for r in results.values()
        if r.get("err", "no_oracle") != "no_oracle" or not r.get("hash_match", True)
    )
    print(f"\n{len(results)} queries, {n_bad} problems")
    with open("/tmp/driver_sim.json", "w") as f:
        json.dump(results, f, indent=1, default=str)


if __name__ == "__main__":
    main()
