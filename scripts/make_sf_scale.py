"""Derive a 10×-scale test dataset from /root/testdata/sf0.1 — the sf1 leg.

The driver ships sf{0.001,0.01,0.1}; the scale claims (candidate-volume
growth guards, per-query scaling factors) deserve one empirical point past
the bench SF.  This derives sf1 DETERMINISTICALLY (no RNG) from sf0.1 by
10-fold replication with referential integrity preserved and per-replica
perturbation so growth is organic rather than pure duplication:

- constant dimensions (region, nation) copy unchanged — they do not grow
  with corpus size at any SF;
- fact/entity tables get replica key offsets of ``r × base_count`` with
  every foreign key offset by ITS referenced table's base (orders→customer,
  lineitem→{orders,part,supplier}, events.user_id→customer), so every join
  finds its rows and per-replica key arithmetic (``% 10`` eval marking,
  ``< 8`` centroid seeds) keeps the same population fractions as the
  driver's own generator;
- ``documents.text`` gains a replica suffix token (n_chars recomputed), so
  cross-replica docs are near- but not exact-duplicates — dedup families
  see realistic growth, not a 10× mirror;
- ``embeddings.embedding`` is rotated by r components per replica —
  norm-preserving, deterministic, cross-replica cosines vary while each
  replica's internal geometry matches the base corpus.

Usage:  python scripts/make_sf_scale.py [OUT_DIR]   (default /tmp/sg_sf1)
Then:   SPARK_GRAFT_SF_DIR=/tmp/sg_sf1 python bench.py
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

BASE = "/root/testdata/sf0.1"
FACTOR = 10

# base_count per replicated table (drives both its own offset and every
# foreign-key offset referencing it)
COUNTS = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}


def replica_select(table: str, r: int) -> str:
    src = f"read_parquet('{BASE}/{table}.parquet')"
    # entity NAMES get a per-replica suffix (prefix-preserving, so LIKE
    # 'foo%' predicates still match): 10 exact copies of every name would
    # make name-blocking groups grow 10x and candidate pairs ~100x — a
    # generator artifact, not organic growth (the sf1 fuzzy-blocking guard
    # caught exactly this on the first unperturbed cut).  The digit is
    # DOUBLED so any two replicas of the same base name sit at edit
    # distance 2 from each other (' r33' vs ' r77') — a single-digit
    # suffix put them at distance 1, which made every base name a 10-way
    # edit-distance-1 clique across replicas and grew fuzzy-match pair
    # counts ~4.5x over linear (another derivation artifact: organic
    # near-dups replicate, they don't cross-link between replicas)
    def named(col: str) -> str:
        return col if r == 0 else f"{col} || ' r{r}{r}' AS {col}"

    if table == "customer":
        return (f"SELECT c_custkey + {r * COUNTS['customer']} AS c_custkey,"
                f" {named('c_name')}, c_nationkey, c_acctbal, c_mktsegment"
                " FROM " + src)
    if table == "supplier":
        return (f"SELECT s_suppkey + {r * COUNTS['supplier']} AS s_suppkey,"
                f" {named('s_name')}, s_nationkey, s_acctbal FROM " + src)
    if table == "part":
        return (f"SELECT p_partkey + {r * COUNTS['part']} AS p_partkey,"
                f" {named('p_name')}, p_brand, p_type, p_size, p_retailprice"
                " FROM " + src)
    if table == "orders":
        return (f"SELECT o_orderkey + {r * COUNTS['orders']} AS o_orderkey,"
                f" o_custkey + {r * COUNTS['customer']} AS o_custkey,"
                " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
                " FROM " + src)
    if table == "lineitem":
        return (f"SELECT l_orderkey + {r * COUNTS['orders']} AS l_orderkey,"
                f" l_partkey + {r * COUNTS['part']} AS l_partkey,"
                f" l_suppkey + {r * COUNTS['supplier']} AS l_suppkey,"
                " l_linenumber, l_quantity, l_extendedprice, l_discount,"
                " l_tax, l_returnflag, l_linestatus, l_shipdate FROM " + src)
    if table == "events":
        return (f"SELECT event_id + {r * COUNTS['events']} AS event_id, ts,"
                f" user_id + {r * COUNTS['customer']} AS user_id,"
                " event_type, value, props FROM " + src)
    if table == "documents":
        if r == 0:
            return ("SELECT doc_id, text, lang, source, n_chars FROM " + src)
        return (f"SELECT doc_id + {r * COUNTS['documents']} AS doc_id,"
                f" text || ' rep{r}' AS text, lang, source,"
                f" CAST(length(text || ' rep{r}') AS BIGINT) AS n_chars"
                " FROM " + src)
    if table == "embeddings":
        if r == 0:
            return "SELECT vec_id, embedding, label FROM " + src
        # rotate by r components: [r+1 ..] || [1 .. r] (1-based slices)
        return (f"SELECT vec_id + {r * COUNTS['embeddings']} AS vec_id,"
                f" embedding[{r + 1}:] || embedding[1:{r}] AS embedding,"
                " label FROM " + src)
    raise ValueError(table)


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in ("region", "nation"):
        shutil.copy(f"{BASE}/{t}.parquet", f"{out_dir}/{t}.parquet")
        print(f"{t}: copied")
    con = duckdb.connect()
    for t in COUNTS:
        union = "\nUNION ALL\n".join(replica_select(t, r) for r in range(FACTOR))
        con.execute(
            f"COPY ({union}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        assert n == FACTOR * COUNTS[t], (t, n)
        print(f"{t}: {n} rows")
    # referential spot checks
    orphans = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out_dir}/orders.parquet') o"
        f" ANTI JOIN read_parquet('{out_dir}/customer.parquet') c"
        " ON o.o_custkey = c.c_custkey"
    ).fetchone()[0]
    assert orphans == 0, f"orders with no customer: {orphans}"
    orphans = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out_dir}/lineitem.parquet') l"
        f" ANTI JOIN read_parquet('{out_dir}/orders.parquet') o"
        " ON l.l_orderkey = o.o_orderkey"
    ).fetchone()[0]
    assert orphans == 0, f"lineitem with no order: {orphans}"
    print("referential integrity OK ->", out_dir)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sg_sf1")
