"""Build the scale-sweep replica: N copies of an sf fixture with every id
column offset per replica (referential integrity preserved — an id is
shifted identically wherever it appears). Adversarial by construction for
dedup operators: every document/vector/name exists N times.

    python tools/make_replica.py [--src /root/testdata/sf0.1] [--dst /tmp/scale10] [--n 10]

``--skew zipf`` additionally remaps the fact-table FOREIGN keys so ONE hot
key holds ~30% of all rows (decided by a deterministic hash of the row's
primary id; the hot key is the minimum id of replica 0, so referential
integrity still holds). This is the 100 TB failure mode the uniform
replicas cannot see — a hot shuffle partition in joins, aggregations,
windows, and stream-stream join state — and the skew gate
(tools/sweep_skew_list.txt) runs the join/window headliners against it.

    python tools/make_replica.py --dst /tmp/skew10 --skew zipf
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


# fact-table FK -> (row-identity column that decides hotness, dimension
# table, dimension id whose MINIMUM becomes the hot key)
SKEW_COLS = {
    "orders": {"o_custkey": ("o_orderkey", "customer", "c_custkey")},
    "lineitem": {
        "l_suppkey": ("l_orderkey", "supplier", "s_suppkey"),
        "l_partkey": ("l_orderkey", "part", "p_partkey"),
    },
    "events": {"user_id": ("event_id", "events", "user_id")},
}
HOT_PCT = 3  # hash(row id) % 10 < 3  =>  ~30% of rows on the hot key


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/scale10")
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--skew", choices=["none", "zipf"], default="none")
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    for table, ids in ID_COLS.items():
        src = os.path.join(args.src, f"{table}.parquet")
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        skew = SKEW_COLS.get(table, {}) if args.skew == "zipf" else {}

        def _expr(c):
            base = f"{c} + r.k * {STRIDE}" if c in ids else c
            if c in skew:
                row_id, dim, dim_id = skew[c]
                hot = con.sql(
                    f"SELECT MIN({dim_id}) FROM '{os.path.join(args.src, dim)}.parquet'"
                ).fetchone()[0]
                # deterministic ~30% of rows land on the hot key (replica 0's
                # minimum dimension id — a real id, so joins still resolve)
                return (
                    f"CASE WHEN hash({row_id}) % 10 < {HOT_PCT} "
                    f"THEN {hot} ELSE {base} END AS {c}"
                )
            return f"{base} AS {c}"

        proj = ", ".join(_expr(c) for c in cols)
        out = os.path.join(args.dst, f"{table}.parquet")
        con.sql(
            f"COPY (SELECT {proj} FROM '{src}', "
            f"(SELECT unnest(range({args.n})) AS k) r) "
            f"TO '{out}' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows")
    if args.skew == "zipf":
        hot_n = con.sql(
            f"SELECT COUNT(*) FROM '{os.path.join(args.dst, 'lineitem.parquet')}' "
            f"GROUP BY l_suppkey ORDER BY 1 DESC LIMIT 1"
        ).fetchone()[0]
        total = con.sql(
            f"SELECT COUNT(*) FROM '{os.path.join(args.dst, 'lineitem.parquet')}'"
        ).fetchone()[0]
        print(f"skew: hottest l_suppkey holds {hot_n}/{total} rows ({hot_n/total:.1%})")


if __name__ == "__main__":
    main()
