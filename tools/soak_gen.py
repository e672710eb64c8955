"""Generate a scaled soak dataset (~sf1) from the driver's read-only
sf0.1 parquet by unioning N key-shifted copies (VERDICT r3 #8).

The driver only ships sf{0.001,0.01,0.1}; the soak needs one more
decade to measure per-query scaling exponents. Scaling by replication
with *consistent* key shifts preserves join fan-in/fan-out exactly
(every shifted order still matches its shifted customer/lineitem), so
join/agg cardinalities grow linearly like a real sf1 would, while
group-key domains (nation, status, brand...) keep their real sizes.

Deliberate choices for workload realism:
- region/nation are fixed dims in TPC-H — copied once, not scaled.
- documents get a per-copy suffix token so the corpus is 10x near-dup
  rather than 10x exact-dup: exact dedup still collapses nothing across
  copies, MinHash/LSH sees realistic high-similarity pairs.
- embeddings get a tiny per-copy perturbation on the first component so
  k-means/IVF don't see degenerate zero-distance duplicates.

Writes to --out (default /tmp/sf1_soak); never touches /root/testdata.
"""

from __future__ import annotations

import argparse
import os

import duckdb

SHIFT = 10_000_000  # > any sf0.1 key domain; keeps copies disjoint

TABLES = {
    # table -> per-copy SELECT template ({i} = copy index, 0-based)
    "customer": (
        "SELECT c_custkey + {i}*{S} AS c_custkey, c_name, c_nationkey,"
        " c_acctbal, c_mktsegment FROM src"
    ),
    "supplier": (
        "SELECT s_suppkey + {i}*{S} AS s_suppkey, s_name, s_nationkey,"
        " s_acctbal FROM src"
    ),
    "part": (
        "SELECT p_partkey + {i}*{S} AS p_partkey, p_name, p_brand, p_type,"
        " p_size, p_retailprice FROM src"
    ),
    "orders": (
        "SELECT o_orderkey + {i}*{S} AS o_orderkey,"
        " o_custkey + {i}*{S} AS o_custkey, o_orderstatus, o_totalprice,"
        " o_orderdate, o_orderpriority FROM src"
    ),
    "lineitem": (
        "SELECT l_orderkey + {i}*{S} AS l_orderkey,"
        " l_partkey + {i}*{S} AS l_partkey,"
        " l_suppkey + {i}*{S} AS l_suppkey, l_linenumber, l_quantity,"
        " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
        " l_shipdate FROM src"
    ),
    "events": (
        "SELECT event_id + {i}*{S} AS event_id, ts,"
        " user_id + {i}*{S} AS user_id, event_type, value, props FROM src"
    ),
    "documents": (
        "SELECT doc_id + {i}*{S} AS doc_id,"
        " CASE WHEN {i} = 0 THEN text ELSE text || ' v{i}' END AS text,"
        " lang, source,"
        " CASE WHEN {i} = 0 THEN n_chars"
        "      ELSE n_chars + length(' v{i}') END AS n_chars FROM src"
    ),
    "embeddings": (
        "SELECT vec_id + {i}*{S} AS vec_id,"
        " CAST(list_prepend(embedding[1] + {i}*0.0001::FLOAT,"
        "                   embedding[2:]) AS FLOAT[]) AS embedding,"
        " label FROM src"
    ),
}

FIXED_DIMS = ["region", "nation"]


def generate(src_dir: str, out_dir: str, copies: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED_DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{src_dir}/{t}.parquet')"
            f" TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, tmpl in TABLES.items():
        con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{src_dir}/{t}.parquet'")
        union = " UNION ALL ".join(
            tmpl.format(i=i, S=SHIFT) for i in range(copies)
        )
        con.execute(
            f"COPY ({union}) TO '{out_dir}/{t}.parquet'"
            f" (FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1_soak")
    ap.add_argument("--copies", type=int, default=10)
    a = ap.parse_args()
    generate(a.src, a.out, a.copies)
