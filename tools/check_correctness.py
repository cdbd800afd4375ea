#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

For every query in __spark_entry__.queries(): run it on Spark at sf0.01,
run the matching oracle_sql() in DuckDB over the same parquet files, and
compare (row count, schema, order-insensitive value hash).

Usage:
    python tools/check_correctness.py            # all queries
    python tools/check_correctness.py q1 q2 ...  # subset
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python tools/check_correctness.py
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize_type(t: str) -> str:
    t = str(t).lower()
    aliases = {
        "int64": "bigint", "long": "bigint", "int32": "int", "integer": "int",
        "float64": "double", "varchar": "string", "object": "string",
        "date32[day]": "date", "bool": "boolean",
    }
    return aliases.get(t, t)


def frame_fingerprint(df) -> tuple[int, dict, str]:
    """(row_count, {col: type}, order-insensitive value hash) of a pandas DataFrame."""
    import pandas as pd

    cols = sorted(df.columns)
    df = df[cols]
    schema = {c: normalize_type(df[c].dtype) for c in cols}

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "\x00"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    rows = sorted(
        "\x1f".join(cell(v) for v in rec) for rec in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256("\n".join(rows).encode("utf-8", "surrogatepass")).hexdigest()
    return len(df), schema, h


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: check_correctness.py [--json OUT.json] "
                     "[--sf SF_DIR] [query ...]")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    # --sf overrides the env var. Parsed explicitly because the old
    # behavior — unknown flags silently became query-NAME filters — made
    # `--sf DIR` run the named queries at the DEFAULT scale factor (or,
    # with no names, filter every query out and write an empty ledger)
    # while looking like a successful larger-scale check.
    if "--sf" in args:
        i = args.index("--sf")
        if i + 1 >= len(args):
            sys.exit("usage: check_correctness.py [--json OUT.json] "
                     "[--sf SF_DIR] [query ...]")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    unknown = [a for a in args if a.startswith("-")]
    if unknown:
        sys.exit(f"unknown flag(s) {unknown}: "
                 "usage: check_correctness.py [--json OUT.json] [--sf SF_DIR] [query ...]")
    only = set(args)

    import __spark_entry__ as entry_mod
    from habits_etl_spark.session import get_spark

    spark = get_spark("check_correctness")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    failures = []
    ledger: dict[str, dict] = {}
    # Per-id (spark_sec, oracle_sec) sweep cost: ext_cosine_pairs_lsh
    # silently cost ~70 s per full sweep for seven rounds because nothing
    # surfaced per-id time — the ledger now carries a slowest-10 section
    # so the next silent hog (Spark OR DuckDB side) is visible the round
    # it appears.
    sweep_secs: dict[str, dict] = {}
    for name in qs:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:
            n_fail += 1
            failures.append(name)
            ledger[name] = {"status": "fail", "err": f"spark error: {exc}"}
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        t_spark = round(time.time() - t0, 3)
        if name not in oracles:
            n_rows_only += 1
            ledger[name] = {"status": "rows_only", "spark_rows": len(sdf)}
            sweep_secs[name] = {"spark_sec": t_spark, "oracle_sec": 0.0}
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        t1 = time.time()
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:
            n_fail += 1
            failures.append(name)
            ledger[name] = {"status": "fail", "err": f"duckdb error: {exc}"}
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        sweep_secs[name] = {
            "spark_sec": t_spark,
            "oracle_sec": round(time.time() - t1, 3),
        }
        sn, ss, sh = frame_fingerprint(sdf)
        on, os_, oh = frame_fingerprint(odf)
        if sn == on and sh == oh:
            schema_note = "" if ss == os_ else f"  [schema diff: {ss} vs {os_}]"
            n_pass += 1
            ledger[name] = {
                "status": "pass",
                "rows": sn,
                "schema_match": ss == os_,
                "hash": sh,
            }
            print(f"PASS  {name}: {sn} rows{schema_note} [{time.time()-t0:.1f}s]")
        else:
            n_fail += 1
            failures.append(name)
            ledger[name] = {
                "status": "fail",
                "spark_rows": sn,
                "oracle_rows": on,
                "hash_match": sh == oh,
            }
            print(f"FAIL  {name}: rows {sn} vs {on}, hash {'ok' if sh == oh else 'MISMATCH'}")
            if sn and on:
                print("  spark:", sdf.sort_values(sorted(sdf.columns)[0]).head(3).to_dict("records"))
                print("  duck :", odf.sort_values(sorted(odf.columns)[0]).head(3).to_dict("records"))

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")

    # Solo re-probe of the slowest-5 Spark-side sweep entries (r14,
    # VERDICT r13 #1b): the sweep runs each query ONCE inside a long
    # shared-session pass on a bursty shared host, so its timing column
    # was unusable round-over-round — r13's committed sf0.1 ledger
    # recorded ext_multimodal_features at 49.3 s (churn) vs ~1.4 s warm
    # witnesses, with no counter-evidence on the record. Each slow id is
    # re-run once, minutes after its first measurement (a different slice
    # of the host timeline); BOTH numbers land in the ledger so "churn or
    # regression?" is answerable from the record alone. Hashes, not
    # timings, remain the correctness gate — the re-probe never changes a
    # status.
    sweep_reprobes: dict[str, dict] = {}
    for name, secs in sorted(
        sweep_secs.items(), key=lambda kv: -kv[1]["spark_sec"]
    )[:5]:
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).toPandas()
            reprobe = round(time.time() - t0, 3)
        except Exception:
            continue
        sweep_reprobes[name] = {
            "first_spark_sec": secs["spark_sec"],
            "reprobe_spark_sec": reprobe,
        }
        print(f"re-probe {name}: first={secs['spark_sec']}s reprobe={reprobe}s")

    if json_out:
        import json

        import subprocess

        try:
            head = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, cwd=os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))),
            ).stdout.strip()
        except Exception:
            head = None
        slowest = sorted(
            sweep_secs.items(),
            key=lambda kv: -(kv[1]["spark_sec"] + kv[1]["oracle_sec"]),
        )[:10]
        with open(json_out, "w") as f:
            json.dump(
                {
                    "git_head": head,  # audit: which tree this ledger attests
                    "sf_dir": sf_dir,
                    "summary": {
                        "pass": n_pass,
                        "fail": n_fail,
                        "rows_only": n_rows_only,
                    },
                    # top-10 sweep hogs, Spark and DuckDB halves split —
                    # a silent per-id cost must show up in the ledger the
                    # round it appears, not in a later bisect
                    "slowest_sweep_ids": [
                        {"id": n, **secs} for n, secs in slowest
                    ],
                    # solo re-probes of the slowest-5 Spark entries (r14):
                    # first vs re-probe answers "churn or regression?"
                    # from the ledger itself
                    "slowest_reprobes": sweep_reprobes,
                    "total_sweep_sec": round(
                        sum(
                            s["spark_sec"] + s["oracle_sec"]
                            for s in sweep_secs.values()
                        ),
                        1,
                    ),
                    "queries": ledger,
                },
                f,
                indent=1,
            )
        print(f"ledger written: {json_out}")
    if failures:
        print("failures:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
