#!/usr/bin/env python3
"""Generate a driver-shaped synthetic SF directory (round-14 scale probe).

Replicates /root/testdata/sf*'s schemas and distributions at an arbitrary
scale factor so the heavy operators can be load-tested at sf1+ locally
(VERDICT r13 item 4). NOT a TPC-H dbgen clone — it copies the DRIVER's
simplified tables (TESTDATA.md), profiled from sf0.1:

  table       rows(sf)        notes
  region      5               fixed
  nation      25              fixed
  supplier    10_000*sf      s_nationkey uniform
  customer    150_000*sf    c_mktsegment 5 values uniform
  part        200_000*sf    p_name = "<adj> <noun>" word pairs,
                              p_retailprice = 900 + 0.1*key (profiled)
  orders      1_500_000*sf   o_custkey uniform over customers,
                              o_orderdate uniform 2024-01..2024-06
  lineitem    6_000_000*sf   l_orderkey = key/4 (4-per-order fanout),
                              l_partkey/l_suppkey uniform
  events      1_000_000*sf   ts uniform over 2024-01 (30 days),
                              user_id uniform over customers/10,
                              props = '{"k": <0..99>}'
  documents   50_000*sf      10..100 tokens from the 30-word vocab,
                              5%% get a trailing "dup" token, ~0.3%%
                              exact-dup pairs (copy of an earlier doc)
  embeddings  20_000*sf      64-dim float unit-normalized gaussian

Determinism: hash-based pseudo-randomness keyed on row id (seed 42) —
same sf → same bytes, no RNG state. Writes <out>/<table>.parquet.

Usage: python3 scripts/gen_sf.py 1.0 /tmp/sf1  [--threads N]
Keep outputs OUT of git (multi-GB at sf1).
"""
import sys

import duckdb

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "en", "zh", "es", "fr", "de"]  # en ~2x the rest (profiled 2059/5000)
SEGMENTS = ["FURNITURE", "MACHINERY", "BUILDING", "AUTOMOBILE", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
EVENT_TYPES = ["click", "view", "purchase", "login", "logout"]
ADJS = ["large", "hot", "blue", "red", "small", "green", "cold", "dark",
        "light", "heavy"]
NOUNS = ["ring", "bolt", "screw", "nut", "washer", "gear", "pin", "rod",
         "plate", "cap"]
TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
RETURNFLAGS = ["N", "N", "A", "R"]
LINESTATUS = ["O", "F"]


def sql_list(vals):
    return "[" + ", ".join("'" + v + "'" for v in vals) + "]"


# Deterministic per-(id, salt) uniform in [0, 1): a lowbias32-style
# integer hash (multiply-fold then two xorshift-multiply rounds, the
# published 0x45d9f3b finalizer constants) — pure SQL so DuckDB
# vectorizes it. The salt enters BEFORE the nonlinear rounds so columns
# decorrelate: the previous form ((i + salt) * M mod 2^32) was a Weyl
# sequence, making every column pair an exact affine function of the
# other (o_custkey vs o_totalprice, ...) and sequential rows advance by
# a constant stride — marginals were uniform but join/group skew and
# selectivity interactions were unreal (round-15 ADVICE). All
# intermediates stay under 2^63: col*M <= 18e6*2.7e9 ~ 5e16 at sf3,
# and each round multiplies a (< 2^32) value by 0x45d9f3b (~7.3e7).
def u(salt, col="i"):
    x0 = f"(({col} * 2654435761 + {salt} * 40503) % 4294967296)"
    x1 = f"((xor({x0}, {x0} // 65536) * 73244475) % 4294967296)"
    x2 = f"((xor({x1}, {x1} // 65536) * 73244475) % 4294967296)"
    return f"(xor({x2}, {x2} // 65536)) / 4294967296.0"


def main():
    sf = float(sys.argv[1])
    out = sys.argv[2].rstrip("/")
    threads = 8
    if "--threads" in sys.argv:
        threads = int(sys.argv[sys.argv.index("--threads") + 1])
    import os
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")

    def write(name, q):
        con.execute(
            f"COPY ({q}) TO '{out}/{name}.parquet' (FORMAT parquet, "
            f"COMPRESSION zstd, ROW_GROUP_SIZE 262144)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows", flush=True)

    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    write("region", """
        SELECT i::INT AS r_regionkey,
               ['AFRICA','AMERICA','ASIA','EUROPE','MIDDLE EAST'][i+1] AS r_name
        FROM (SELECT unnest(range(5)) AS i)""")

    write("nation", """
        SELECT i::INT AS n_nationkey,
               'NATION_' || i AS n_name,
               (i % 5)::INT AS n_regionkey
        FROM (SELECT unnest(range(25)) AS i)""")

    write("supplier", f"""
        SELECT i AS s_suppkey,
               'Supplier#' || lpad(i::VARCHAR, 9, '0') AS s_name,
               (floor({u(11)} * 25))::INT AS s_nationkey,
               round({u(12)} * 9000.0 + 1000.0, 2) AS s_acctbal
        FROM (SELECT unnest(range({n_supp})) AS i)""")

    write("customer", f"""
        SELECT i AS c_custkey,
               'Customer#' || lpad(i::VARCHAR, 9, '0') AS c_name,
               (floor({u(21)} * 25))::INT AS c_nationkey,
               round({u(22)} * 9000.0 + 1000.0, 2) AS c_acctbal,
               {sql_list(SEGMENTS)}[(floor({u(23)} * 5))::INT + 1] AS c_mktsegment
        FROM (SELECT unnest(range({n_cust})) AS i)""")

    write("part", f"""
        SELECT i AS p_partkey,
               {sql_list(ADJS)}[(floor({u(31)} * {len(ADJS)}))::INT + 1] || ' ' ||
                 {sql_list(NOUNS)}[(floor({u(32)} * {len(NOUNS)}))::INT + 1] AS p_name,
               'Brand#' || (floor({u(33)} * 25))::INT AS p_brand,
               {sql_list(TYPES)}[(floor({u(34)} * {len(TYPES)}))::INT + 1] AS p_type,
               (floor({u(35)} * 50))::INT + 1 AS p_size,
               (900.0 + 0.1 * i)::DOUBLE AS p_retailprice
        FROM (SELECT unnest(range({n_part})) AS i)""")

    write("orders", f"""
        SELECT i AS o_orderkey,
               (floor({u(41)} * {n_cust}))::BIGINT AS o_custkey,
               {sql_list(STATUSES)}[(floor({u(42)} * 3))::INT + 1] AS o_orderstatus,
               round({u(43)} * 400000.0 + 1000.0, 2) AS o_totalprice,
               TIMESTAMP '2024-01-01' + INTERVAL (floor({u(44)} * 180)::INT) DAY
                 AS o_orderdate,
               {sql_list(PRIORITIES)}[(floor({u(45)} * 5))::INT + 1] AS o_orderpriority
        FROM (SELECT unnest(range({n_ord})) AS i)""")

    write("lineitem", f"""
        SELECT (i // 4)::BIGINT AS l_orderkey,
               (floor({u(51)} * {n_part}))::BIGINT AS l_partkey,
               (floor({u(52)} * {n_supp}))::BIGINT AS l_suppkey,
               ((i % 4) + 1)::INT AS l_linenumber,
               (floor({u(53)} * 50) + 1)::DOUBLE AS l_quantity,
               round({u(54)} * 90000.0 + 1000.0, 2) AS l_extendedprice,
               round(floor({u(55)} * 11) / 100.0, 2) AS l_discount,
               round(floor({u(56)} * 9) / 100.0, 2) AS l_tax,
               {sql_list(RETURNFLAGS)}[(floor({u(57)} * 4))::INT + 1] AS l_returnflag,
               {sql_list(LINESTATUS)}[(floor({u(58)} * 2))::INT + 1] AS l_linestatus,
               TIMESTAMP '2024-01-01' + INTERVAL (floor({u(59)} * 210)::INT) DAY
                 AS l_shipdate
        FROM (SELECT unnest(range({n_li})) AS i)""")

    write("events", f"""
        SELECT i AS event_id,
               TIMESTAMP '2024-01-01'
                 + INTERVAL (floor({u(61)} * 2591999)::BIGINT) SECOND
                 + INTERVAL (floor({u(66)} * 1000000)::BIGINT) MICROSECOND AS ts,
               (floor({u(62)} * {max(n_cust // 10, 1)}))::BIGINT AS user_id,
               {sql_list(EVENT_TYPES)}[(floor({u(63)} * 5))::INT + 1] AS event_type,
               round({u(64)} * 100.0, 3) AS value,
               '{{"k": ' || (floor({u(65)} * 100))::INT || '}}' AS props
        FROM (SELECT unnest(range({n_ev})) AS i)""")

    # documents: 10..100 tokens from the 30-word vocab; 5% get a
    # trailing "dup" marker token; ~0.32% of docs are EXACT copies of
    # the doc floor(id/2) (planted exact-dup pairs, like the driver's).
    vocab = sql_list(VOCAB)
    write("documents", f"""
        WITH base AS (
          SELECT i,
                 CASE WHEN {u(71)} < 0.0032 AND i >= 2
                      THEN (i // 2)::BIGINT ELSE i END AS src
          FROM (SELECT unnest(range({n_doc})) AS i)),
        tok AS (
          SELECT i, src,
                 (10 + floor({u(72, 'src')} * 91))::INT AS n_tok,
                 {u(73, 'src')} < 0.05 AS has_dup
          FROM base),
        body AS (
          SELECT i, src, n_tok, has_dup,
                 list_transform(range(n_tok), j ->
                   {vocab}[1 + ((((src * 127 + j * 31 + (src * j) // 7) * 2654435761)
                     % 4294967296 + 4294967296) % 4294967296) % 30]) AS toks
          FROM tok)
        SELECT i AS doc_id,
               list_aggregate(CASE WHEN has_dup THEN list_append(toks, 'dup')
                                   ELSE toks END, 'string_agg', ' ') AS text,
               {sql_list(LANGS)}[(floor({u(74)} * 6))::INT + 1] AS lang,
               'src' || (i % 20) AS source,
               length(list_aggregate(CASE WHEN has_dup
                        THEN list_append(toks, 'dup') ELSE toks END,
                      'string_agg', ' '))::BIGINT AS n_chars
        FROM body""")

    # embeddings: 64-dim, approximately unit-norm gaussian via
    # Box-Muller over the deterministic uniforms, then normalized.
    write("embeddings", f"""
        WITH raw AS (
          SELECT i,
                 list_transform(range(64), j ->
                   sqrt(-2.0 * ln(greatest(
                     (((((i * 64 + j) * 2654435761) % 4294967296
                        + 4294967296) % 4294967296) + 0.5) / 4294967296.0,
                     1e-12)))
                   * cos(2.0 * pi() *
                     (((((i * 64 + j) * 40503) % 65536 + 65536) % 65536)
                      / 65536.0))) AS g
          FROM (SELECT unnest(range({n_emb})) AS i)),
        nrm AS (
          SELECT i, g,
                 sqrt(list_sum(list_transform(g, x -> x * x))) AS n
          FROM raw)
        SELECT i AS vec_id,
               list_transform(g, x -> (x / n)::FLOAT) AS embedding,
               (i % 10)::INT AS label
        FROM nrm""")

    print("done:", out)


if __name__ == "__main__":
    main()
