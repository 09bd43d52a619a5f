"""Local replica of the driver's correctness gate: run every queries()
entry and its DuckDB oracle at sf0.01, compare row count + column set +
order-insensitive values.

Usage: python scripts/check_oracles.py [--json OUT.json] [names...]

--json writes a driver-artifact-shaped file (one entry per query with
rows_match/schema_match/hash_match) — the committed
CORRECTNESS_LOCAL_r{N}.json evidence for queries past the driver's own
artifact cap (VERDICT r5 item 2).
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402

from outage_data_scraper_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    only = set(argv)
    bad = [a for a in only if a.startswith("-")]
    if bad:
        raise SystemExit(
            f"unknown option(s) {bad}: positional args are query-name "
            "filters; the only flag is --json OUT.json (an unrecognized "
            "flag would otherwise match nothing and print an empty "
            "'ALL MATCH')"
        )
    report: dict[str, dict] = {}
    qs = entrymod.queries()
    # Filters match by prefix (so `q103` selects q103_training_sequences);
    # a filter matching NOTHING is an error — it would otherwise print an
    # empty "ALL MATCH" (the silent-trap CLAUDE.md documents).
    if only:
        selected = {n for n in qs if any(n.startswith(p) for p in only)}
        dead = [p for p in only if not any(n.startswith(p) for n in qs)]
        if dead:
            raise SystemExit(
                f"filter(s) {dead} match no registered query — "
                "nothing would run (empty 'ALL MATCH')"
            )
    else:
        selected = set(qs)
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name not in selected:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None, "err": str(e)[:300]}
            print(f"FAIL  {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            report[name] = {"rows_match": len(sdf) >= 0, "schema_match": None,
                            "hash_match": None, "spark_rows": len(sdf),
                            "oracle_rows": None, "err": None,
                            "note": "rows-only (no SQL oracle)"}
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(sdf),
                            "oracle_rows": None,
                            "err": "duckdb: " + str(e)[:300]}
            print(f"FAIL  {name}: duckdb error {str(e)[:300]}")
            continue
        a, b = normalize(sdf.copy()), normalize(odf.copy())
        status = []
        if len(a) != len(b):
            status.append(f"rowcount {len(a)} vs {len(b)}")
        if list(a.columns) != list(b.columns):
            status.append(f"cols {list(a.columns)} vs {list(b.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, atol=1e-6)
            except AssertionError as e:
                status.append("values: " + str(e).split("\n")[0][:200])
                # show a sample diff
                merged = a.merge(b, how="outer", indicator=True)
                diff = merged[merged["_merge"] != "both"]
                if len(diff):
                    status.append(f"{len(diff)} differing rows, e.g.\n" + diff.head(4).to_string())
        ok = not status
        report[name] = {
            "rows_match": len(a) == len(b),
            "schema_match": list(a.columns) == list(b.columns),
            "hash_match": ok,
            "spark_rows": len(a),
            "oracle_rows": len(b),
            "err": " | ".join(status)[:300] or None,
        }
        if status:
            failures.append(name)
            print(f"FAIL  {name}: " + " | ".join(status))
        else:
            print(f"OK    {name}: {len(a)} rows match [{time.time()-t0:.1f}s]")
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {json_path} ({len(report)} queries)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
