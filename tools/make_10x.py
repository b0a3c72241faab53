#!/usr/bin/env python3
"""Synthesize a 10x-scale dataset from an sf dir by replicating each
table with per-replica key shifts (contiguous: shift = replica *
(max_key + 1), so matrix dimensions scale ~10x, not to 10^12) and
content decorrelation:

- documents: every token prefixed with r<i> in replicas >= 1, so
  replicas share no shingles (no artificial cross-replica near-dups;
  within-replica dup structure is preserved exactly).
- embeddings: per-replica deterministic +-1 sign pattern per dimension
  (norms preserved, cross-replica cosines decorrelated).
- dimension tables (region, nation) are NOT replicated — dims don't
  scale with fact data.

Usage: make_10x.py <inDir> <outDir> [factor=10]
"""
import sys, os, hashlib
import duckdb

def sign(i, d):
    h = hashlib.md5(f"{i}_{d}".encode()).hexdigest()
    return 1 if int(h[:2], 16) % 2 == 0 else -1

def main():
    src, out = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}/{t}.parquet'")

    # contiguous shift bases per logical key
    base = {}
    base["orderkey"] = con.execute(
        "SELECT GREATEST(MAX(o_orderkey), (SELECT MAX(l_orderkey) FROM lineitem)) + 1 FROM orders").fetchone()[0]
    base["custkey"] = con.execute(
        "SELECT GREATEST(MAX(c_custkey), (SELECT MAX(o_custkey) FROM orders)) + 1 FROM customer").fetchone()[0]
    base["suppkey"] = con.execute(
        "SELECT GREATEST(MAX(s_suppkey), (SELECT MAX(l_suppkey) FROM lineitem)) + 1 FROM supplier").fetchone()[0]
    base["partkey"] = con.execute(
        "SELECT GREATEST(MAX(p_partkey), (SELECT MAX(l_partkey) FROM lineitem)) + 1 FROM part").fetchone()[0]
    base["doc_id"] = con.execute("SELECT MAX(doc_id) + 1 FROM documents").fetchone()[0]
    base["vec_id"] = con.execute("SELECT MAX(vec_id) + 1 FROM embeddings").fetchone()[0]
    base["user_id"] = con.execute("SELECT MAX(user_id) + 1 FROM events").fetchone()[0]
    base["event_id"] = con.execute("SELECT MAX(event_id) + 1 FROM events").fetchone()[0]

    def emit(table, select_fn):
        parts = [select_fn(i) for i in range(factor)]
        sql = " UNION ALL ".join(parts)
        con.execute(f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n}")

    for t in ["region", "nation"]:
        con.execute(f"COPY (SELECT * FROM {t}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied 1x")

    emit("customer", lambda i:
        f"SELECT c_custkey + {i * base['custkey']} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM customer")
    emit("supplier", lambda i:
        f"SELECT s_suppkey + {i * base['suppkey']} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM supplier")
    emit("part", lambda i:
        f"SELECT p_partkey + {i * base['partkey']} AS p_partkey, p_name, p_brand, p_type, "
        f"p_size, p_retailprice FROM part")
    emit("orders", lambda i:
        f"SELECT o_orderkey + {i * base['orderkey']} AS o_orderkey, "
        f"o_custkey + {i * base['custkey']} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM orders")
    emit("lineitem", lambda i:
        f"SELECT l_orderkey + {i * base['orderkey']} AS l_orderkey, "
        f"l_partkey + {i * base['partkey']} AS l_partkey, "
        f"l_suppkey + {i * base['suppkey']} AS l_suppkey, "
        f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        f"l_returnflag, l_linestatus, l_shipdate FROM lineitem")
    emit("events", lambda i:
        f"SELECT event_id + {i * base['event_id']} AS event_id, ts, "
        f"user_id + {i * base['user_id']} AS user_id, event_type, value, props FROM events")
    emit("documents", lambda i:
        f"SELECT doc_id + {i * base['doc_id']} AS doc_id, " +
        ("text" if i == 0 else
         f"array_to_string(list_transform(string_split(text, ' '), t -> 'r{i}' || t), ' ')") +
        " AS text, lang, source, n_chars FROM documents")
    def emb_sel(i):
        if i == 0:
            return "SELECT vec_id, embedding, label FROM embeddings"
        dims = con.execute("SELECT DISTINCT len(embedding) FROM embeddings").fetchone()[0]
        expr = ", ".join(
            f"embedding[{d + 1}] * ({sign(i, d)})" for d in range(dims))
        return (f"SELECT vec_id + {i * base['vec_id']} AS vec_id, "
                f"CAST([{expr}] AS FLOAT[]) AS embedding, label FROM embeddings")
    emit("embeddings", emb_sel)

if __name__ == "__main__":
    main()
