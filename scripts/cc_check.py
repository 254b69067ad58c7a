#!/usr/bin/env python3
"""Independent cross-check for the connected-components queries
(q49_dedup_clusters, q62_incremental_clusters, q53_neardedup_survivors)
at scale factors where DuckDB's recursive-CTE oracle replay is
impractical (sf0.1: 6.2M pair edges -> the transitive-closure CTE runs
for hours; the engine restructures exactly this shape).

Method: extract the `pairs` CTE from the query's own oracle SQL (the
hash-verified LSH pair semantics — q18's oracle is this same CTE), run
JUST the pair enumeration in DuckDB (seconds), then run an independent
Python union-find over the edges and rebuild the expected output per
the query's documented semantics:

  q49/q62: (id, cluster_id=min of component) for every id in any pair
  q53:     every doc_id EXCEPT non-minimum cluster members

Compare against the Spark outputs Verify wrote (OUT/<query>.parquet).

Usage: cc_check.py VERIFY_OUT_DIR SF_DIR [query ...]
"""
import json
import sys

import duckdb


def pairs_sql(oracle: str) -> str:
    """Truncate the oracle at the end of its first `pairs AS (...)` CTE
    (balanced-paren scan) and select the raw edges instead of recursing."""
    start = oracle.index("pairs AS (")
    i = oracle.index("(", start)
    depth = 0
    for j in range(i, len(oracle)):
        if oracle[j] == "(":
            depth += 1
        elif oracle[j] == ")":
            depth -= 1
            if depth == 0:
                head = oracle[: j + 1]
                return f"WITH RECURSIVE {head[head.index('pairs AS ('):]} SELECT id_a, id_b FROM pairs"
    raise ValueError("unbalanced parens in pairs CTE")


def components(edges):
    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent.keys() | {a for a, _ in edges} | {b for _, b in edges}}


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:] or [
        "q49_dedup_clusters", "q62_incremental_clusters", "q53_neardedup_survivors"]
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for q in queries:
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
        edges = con.execute(pairs_sql(oracles[q])).fetchall()
        comp = components(edges)
        if q.startswith("q53"):
            losers = {i for i, c in comp.items() if i != c}
            expect = sorted(
                r[0] for r in con.execute("SELECT doc_id FROM documents").fetchall()
                if r[0] not in losers)
            got = [r[0] for r in con.execute(
                f"SELECT doc_id FROM '{out_dir}/{q}/*.parquet' ORDER BY doc_id").fetchall()]
        else:
            expect = sorted(comp.items())
            got = con.execute(
                f"SELECT id, cluster_id FROM '{out_dir}/{q}/*.parquet' ORDER BY id").fetchall()
            got = [tuple(r) for r in got]
        ok = expect == got
        bad += 0 if ok else 1
        print(f"{q:28s} {'OK' if ok else 'MISMATCH'} "
              f"({len(edges)} edges, {len(expect)} rows)")
        if not ok:
            exp_only = set(expect) - set(got)
            got_only = set(got) - set(expect)
            print(f"  expect-only: {sorted(exp_only)[:5]}  got-only: {sorted(got_only)[:5]}")
        con.close()
    print(f"{len(queries) - bad} ok, {bad} bad")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
