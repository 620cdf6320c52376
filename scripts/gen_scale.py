#!/usr/bin/env python3
"""Scale-up generator for the cross-SF hardening sweep (round-11 judge
task 1: no sf1 testdata ships with the driver, so the sweep builds its
own). Replicates a source SF directory `factor` times with FK-consistent
id offsets:

  - fixed dimensions (region, nation) copy verbatim;
  - every entity key offsets by replica * (max_key + 1), and every FK
    column offsets by ITS referenced table's stride, so joins behave
    exactly like the source corpus, times `factor`;
  - payload columns (text, embeddings, amounts, timestamps) replicate
    verbatim - the resulting 10-way exact-duplicate document classes
    and duplicate vectors are a deliberate hot-bucket/tie stress, and
    every oracle replays the same parquet so hash-equality still holds.

Usage: python scripts/gen_scale.py /root/testdata/sf0.1 testdata-sf1 10
"""
import sys
import duckdb


def main(src, out, factor):
    import os
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def gen(table, sql_template, strides):
        parts = []
        for i in range(factor):
            sql = sql_template
            for name, stride in strides.items():
                sql = sql.replace("{" + name + "}", str(stride * i))
            parts.append(sql)
        q = " UNION ALL ".join(parts)
        con.execute(f"COPY ({q}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    def stride(table, key):
        return con.sql(
            f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

    # fixed dims: verbatim
    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                    f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied verbatim")

    s_cust = stride("customer", "c_custkey")
    s_supp = stride("supplier", "s_suppkey")
    s_part = stride("part", "p_partkey")
    s_ord = stride("orders", "o_orderkey")
    s_evt = stride("events", "event_id")
    s_user = stride("events", "user_id")
    s_doc = stride("documents", "doc_id")
    s_vec = stride("embeddings", "vec_id")

    gen("customer",
        f"SELECT c_custkey + {{c}} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM '{src}/customer.parquet'",
        {"c": s_cust})
    gen("supplier",
        f"SELECT s_suppkey + {{s}} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM '{src}/supplier.parquet'", {"s": s_supp})
    gen("part",
        f"SELECT p_partkey + {{p}} AS p_partkey, p_name, p_brand, p_type, "
        f"p_size, p_retailprice FROM '{src}/part.parquet'", {"p": s_part})
    gen("orders",
        f"SELECT o_orderkey + {{o}} AS o_orderkey, o_custkey + {{c}} AS o_custkey, "
        f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
        f"FROM '{src}/orders.parquet'", {"o": s_ord, "c": s_cust})
    gen("lineitem",
        f"SELECT l_orderkey + {{o}} AS l_orderkey, l_partkey + {{p}} AS l_partkey, "
        f"l_suppkey + {{s}} AS l_suppkey, l_linenumber, l_quantity, "
        f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        f"l_shipdate FROM '{src}/lineitem.parquet'",
        {"o": s_ord, "p": s_part, "s": s_supp})
    gen("events",
        f"SELECT event_id + {{e}} AS event_id, ts, user_id + {{u}} AS user_id, "
        f"event_type, value, props FROM '{src}/events.parquet'",
        {"e": s_evt, "u": s_user})
    gen("documents",
        f"SELECT doc_id + {{d}} AS doc_id, text, lang, source, n_chars "
        f"FROM '{src}/documents.parquet'", {"d": s_doc})
    gen("embeddings",
        f"SELECT vec_id + {{v}} AS vec_id, embedding, label "
        f"FROM '{src}/embeddings.parquet'", {"v": s_vec})


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
