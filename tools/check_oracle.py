"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()`` entry
exists, the SQL on DuckDB over the same parquet tables; compares row count,
sorted column names, and an order-insensitive value comparison. Use while
iterating:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import decimal
import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from bridge_analytics_template_spark.catalog import TABLES, table_path  # noqa: E402
from bridge_analytics_template_spark.session import get_spark  # noqa: E402


def norm_cell(v):
    # Type-TAGGED normalization: the driver's pandas canon hashes int64 and
    # float64 columns differently, so 1 must NOT equal 1.0 here (a bare
    # Python `1 == 1.0` comparison masked the driver's f_math failure in r1).
    # Decimal is tagged by its string rendering for the same reason:
    # Decimal('1.5') == 1.5 in Python, but the two render differently, so a
    # decimal-on-one-side/double-on-the-other query must FAIL here. Matching
    # Decimals (same scale both engines, e.g. untouched decimal(12,2)
    # columns) still compare equal.
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):  # datetime/date — compare on ISO text
        # Type-tag tz-awareness: the driver's pandas canon treats tz-aware
        # (datetime64[ns, UTC]) and naive (datetime64[ns]) as DIFFERENT
        # schemas — stripping "+00:00" here masked exactly that failure
        # class in r2 (t_tumbling_counts / t_sliding_counts: DuckDB
        # to_timestamp() yields TIMESTAMPTZ). A tz-aware cell must NOT
        # compare equal to its naive twin.
        if getattr(v, "tzinfo", None) is not None:
            return ("ts-tz", v.isoformat())
        return ("ts", v.isoformat())
    if isinstance(v, bytes):
        return v.hex()
    return v


def frame_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--first",
        type=int,
        default=0,
        help="check only the first N registered queries (the driver's window)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(args.sf, t)}')")

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    names = args.names or (list(qs)[: args.first] if args.first else list(qs))
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            srows = sdf.collect()
            scols, svals = frame_to_rows(sdf.columns, [tuple(r) for r in srows])
            if name not in oracles:
                status = f"rows-only ({len(svals)} rows)"
                ok = True
            else:
                cur = con.execute(oracles[name])
                dcols = [d[0] for d in cur.description]
                dvals_raw = cur.fetchall()
                dcols, dvals = frame_to_rows(dcols, dvals_raw)
                ok = True
                msgs = []
                if scols != dcols:
                    ok, _ = False, msgs.append(f"cols spark={scols} duck={dcols}")
                if len(svals) != len(dvals):
                    ok, _ = False, msgs.append(f"rowcount spark={len(svals)} duck={len(dvals)}")
                if ok and svals != dvals:
                    ok = False
                    diffs = [(a, b) for a, b in zip(svals, dvals) if a != b][:3]
                    msgs.append(f"values differ, first diffs: {diffs}")
                status = "OK" if ok else "; ".join(msgs)
            n_pass += ok
            n_fail += not ok
            print(f"[{'PASS' if ok else 'FAIL'}] {name:28s} {time.time()-t0:6.1f}s  {status}")
        except Exception as ex:
            n_fail += 1
            print(f"[ERR ] {name:28s} {time.time()-t0:6.1f}s  {ex}")
            traceback.print_exc(limit=3)
        finally:
            # Queries that persist intermediates (tfidf, cascade, ml-lsh)
            # must not accumulate storage memory across a 225-query run.
            spark.catalog.clearCache()
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
