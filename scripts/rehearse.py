#!/usr/bin/env python
"""Driver rehearsal: run EVERY registered query through the
``__spark_entry__`` contract exactly the way the verify driver does —
plain SparkSession (no engine confs), DuckDB views on the oracle sf,
column-sorted canonical value comparison — and report any mismatch.

Usage:  python scripts/rehearse.py [sf_dir]   (default /root/testdata/sf0.01)

This is stricter than a hash comparison (it prints which rows differ)
and faster than the pytest harness (one process, one session).  Run it
before ending a round; the driver should never see a failure first.
"""

from __future__ import annotations

import datetime
import importlib
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v) -> str:
    if isinstance(v, np.generic):
        v = v.item()
    if v is None or v is pd.NaT:
        return "N"
    if isinstance(v, float):
        return "N" if math.isnan(v) else repr(v)
    if isinstance(v, pd.Timestamp):
        return v.date().isoformat() if v == v.normalize() else v.isoformat(sep=" ")
    if isinstance(v, datetime.datetime):
        return canon(pd.Timestamp(v))
    if isinstance(v, datetime.date):
        return v.isoformat()
    try:
        if pd.isna(v):
            return "N"
    except (TypeError, ValueError):
        pass
    return repr(v)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = df.apply(lambda c: c.map(canon))
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # lazy oracle factories (q_similarity_ivf) read this env var when
    # oracle_sql() resolves them — pin it to the sf being rehearsed
    os.environ["SPARK_GRAFT_TEST_SF_DIR"] = sf_dir
    m = importlib.import_module("__spark_entry__")
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, osql = m.queries(), m.oracle_sql()
    print(f"rehearsing {len(qs)} queries ({len(osql)} oracled) at {sf_dir}")
    bad = []
    for name in sorted(qs):
        try:
            got = qs[name](spark, sf_dir).toPandas()
            if name in osql:
                want = con.sql(osql[name]).df()
                g, w = norm(got), norm(want)
                if list(g.columns) != list(w.columns):
                    bad.append((name, f"columns {list(g.columns)} vs {list(w.columns)}"))
                elif len(g) != len(w):
                    bad.append((name, f"rows {len(g)} vs {len(w)}"))
                elif not g.equals(w):
                    n_diff = int((~(g == w).all(axis=1)).sum())
                    bad.append((name, f"{n_diff} differing rows"))
        except Exception as ex:  # noqa: BLE001 - report, don't die
            bad.append((name, f"ERROR {str(ex)[:140]}"))
    print(f"{len(bad)} problems")
    for name, why in bad:
        print(f"  {name}: {why}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
