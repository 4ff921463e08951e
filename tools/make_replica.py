"""Build the scale-sweep replica: N copies of an sf fixture with every id
column offset per replica (referential integrity preserved — an id is
shifted identically wherever it appears). Adversarial by construction for
dedup operators: every document/vector/name exists N times.

    python tools/make_replica.py [--src /root/testdata/sf0.1] [--dst /tmp/scale10] [--n 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# One offset stride for all ids: larger than any fixture id at the SFs we
# replicate, so replica id ranges never collide.
STRIDE = 10_000_000

ID_COLS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/scale10")
    ap.add_argument("--n", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    for table, ids in ID_COLS.items():
        src = os.path.join(args.src, f"{table}.parquet")
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        proj = ", ".join(
            f"{c} + r.k * {STRIDE} AS {c}" if c in ids else c for c in cols
        )
        out = os.path.join(args.dst, f"{table}.parquet")
        con.sql(
            f"COPY (SELECT {proj} FROM '{src}', "
            f"(SELECT unnest(range({args.n})) AS k) r) "
            f"TO '{out}' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
