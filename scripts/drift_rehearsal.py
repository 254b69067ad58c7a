#!/usr/bin/env python3
"""Full-gate drift rehearsal: rebuild a testdata dir under a type drift
the driver's generator could ship, then run the ENTIRE oracle gate
against it — Spark (graft.Verify) and DuckDB (scripts/check.py) both
reading the drifted tables. The spec-level nets (LayoutEncodingSpec,
UnsignedEncodingSpec) pin the Spark side per consumer; this rehearses
the ORACLE side too, where DuckDB's native arithmetic on the drifted
types (exact DECIMAL sums, UBIGINT ids) can silently diverge from the
double/long semantics `Engine.canonicalNumerics` normalizes to.

Usage:
    python3 scripts/drift_rehearsal.py <sf_dir> <decimal|uint|binary|hive|nanos|bss|lz4|gzip|duckdb|extracol|delta|brotli|torn> <replica_dir>
    SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify <replica_dir> /tmp/verify_drift"
    python3 scripts/check.py /tmp/verify_drift <replica_dir>   # expect N ok, 0 bad
    # EXCEPT brotli: the expected outcome is every table-reading query
    # failing BY NAME ("cannot decode ... BrotliCodec"), not N ok —
    # grep Verify's stderr; an OPAQUE FAILED_READ_FILE is the bug
    # EXCEPT torn: same designed-failure convention — every query must
    # fail BY NAME ("parquet leaf file ... cannot be read — <defect>",
    # Engine's TornFileException), naming the damaged leaf and the
    # defect; an OPAQUE FAILED_READ_FILE mid-execution is the bug

Variants (all value-preserving, so any diff is a SEMANTICS gap, not
data skew):
  decimal  double -> DECIMAL(38,18), int64 -> DECIMAL(20,0)  (the
           TPC-H-canonical-schema class; 18 dp round-trips any double
           carrying <= 17 significant digits)
  uint     int64 -> uint64, int32 -> uint32  (numpy-uint ids; Spark
           reads DECIMAL(20,0)/LONG, DuckDB reads UBIGINT/UINTEGER)
  binary   string -> binary (same BYTE_ARRAY bytes, UTF8 annotation
           stripped; Spark reads BinaryType -> Engine.utf8Strings,
           DuckDB reads BLOB -> check.py's decode() view)
  hive     each table rewritten as a hive-partitioned DIRECTORY
           (key=value subdirs, partition column re-inferred from dir
           names; LayoutEncodingSpec's round-11 class — events
           deliberately partitioned by its int64 user_id key)
  nanos    timestamp columns -> timestamp[ns] (pandas datetime64[ns]
           without coerce_timestamps; Spark's nanosAsLong surfaces
           them as raw ns LONGs -> Engine.recoverNanosTimestamps
           rebuilds the timestamp from the footer annotation; DuckDB
           reads TIMESTAMP_NS natively — NanosEncodingSpec)
  bss      double columns re-encoded BYTE_STREAM_SPLIT (no dictionary
           on those columns) — the float-compression flip a pyarrow
           option ships; schema-identical, so this rehearses both
           engines' DECODERS only
  lz4      every page recompressed lz4 (pyarrow compression='lz4') —
           the remaining codec flip beyond the snappy/zstd pins;
           transparent in principle, rehearsed so a flip can never be
           conflated with a real drift
  gzip     every page recompressed gzip — with snappy canonical, zstd
           spec-pinned, and lz4 rehearsed, this completes the
           decodable-codec matrix (hadoop's GzipCodec ships in the
           Spark distribution; transparent in principle)
  delta    every leaf re-encoded with the page-v2 DELTA family:
           DELTA_BINARY_PACKED on INT32/INT64 leaves (ids, dates,
           timestamps), DELTA_BYTE_ARRAY on BYTE_ARRAY leaves
           (strings, binary), PLAIN elsewhere (floats/bools have no
           DELTA form), dictionary off so the target encodings
           actually land on the pages, data pages v2 — the remaining
           DECODABLE encoding family beyond the BSS/dictionary/layout
           pins, which Spark's vectorized reader implements on a
           separate code path from PLAIN/dictionary; transparent in
           principle
  duckdb   every table rewritten by DuckDB's OWN parquet writer
           (COPY ... TO (FORMAT PARQUET)) — the driver toolchain
           ships duckdb, so a generator swap from pyarrow to DuckDB
           COPY is a realistic whole-WRITER flip (different
           encodings, page layout, metadata) rather than a
           single-knob drift; transparent in principle
  extracol every table gains an unknown trailing column
           (_r12_extra_col int64) — additive schema evolution, the
           driver flip where a future TESTDATA round ships MORE
           columns than the contract: every consumer and every oracle
           must project by NAME and survive the superset (no base
           table is read with SELECT * on either side)
  brotli   every page recompressed brotli — the UNDECODABLE codec
           class: pyarrow/DuckDB ship brotli but no hadoop codec class
           is on this Spark classpath, so NEITHER Spark reader can
           decode the pages and no restage can absorb them. The gate
           on this replica must fail BY NAME per query (Engine's
           footer probe: table + BROTLI + the missing class —
           CodecEncodingSpec pins it), never as opaque
           FAILED_READ_FILE scan deaths
  torn     every table structurally DAMAGED, three shapes rotated by
           table index: (0) truncated to 60% (footer magic gone),
           (1) tail overwritten with XXXX (corrupt footer magic),
           (2) 4 KB cut out of the data region with the tail kept
           (footer intact, column chunks overrun the data — the
           partial-copy shape). Like brotli, the DESIGNED outcome is
           named failures: every table-reading query dies pre-scan
           with Engine's TornFileException naming the leaf file + the
           defect + the remediation (TornFileSpec pins the probe,
           batch and streaming legs); an opaque FAILED_READ_FILE is
           the bug. The DuckDB side of check.py would fail on the
           same bytes, so only the Verify leg is meaningful here.

Round-10 findings this loop caught (all fixed, all no-ops on
canonical data): DECIMAL multiplication overflow in every money
expression, decimal ids in array_extract / bitwise z-order / the q101
hash arithmetic, median-interpolation divergence on DECIMAL, and —
after over-correcting with CAST AS DOUBLE inside trunc() — that
DuckDB's decimal->double cast is not correctly rounded and flips
trunc at integer boundaries, so the salary-kernel seeds take the raw
column (exact decimal trunc == double trunc for round-trippable
values).
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def recode(variant: str, f: pa.Field) -> pa.Field:
    if variant == "decimal":
        if pa.types.is_float64(f.type):
            return pa.field(f.name, pa.decimal128(38, 18))
        if pa.types.is_int64(f.type):
            return pa.field(f.name, pa.decimal128(20, 0))
    elif variant == "uint":
        if pa.types.is_int64(f.type):
            return pa.field(f.name, pa.uint64())
        if pa.types.is_int32(f.type):
            return pa.field(f.name, pa.uint32())
    elif variant == "binary":
        if pa.types.is_string(f.type):
            return pa.field(f.name, pa.binary())
        if pa.types.is_large_string(f.type):
            return pa.field(f.name, pa.large_binary())
    elif variant == "nanos":
        if pa.types.is_timestamp(f.type):
            return pa.field(f.name, pa.timestamp("ns", tz=f.type.tz))
    return f


# mirrors LayoutEncodingSpec.hivePartitionCol — events by its int64 KEY
# so the oracle side also rehearses the partition-type re-inference;
# documents TWO-LEVEL (nested key=value dirs); part's p_brand values
# carry '#' so the url-escaping path is exercised (q13/q32 caught
# DuckDB 1.0 reading 'Brand%2312' literally)
HIVE_PARTITION_COL = {
    "region": ["r_name"], "nation": ["n_regionkey"],
    "customer": ["c_mktsegment"], "supplier": ["s_nationkey"],
    "part": ["p_brand"], "orders": ["o_orderstatus"],
    "lineitem": ["l_returnflag"], "events": ["user_id"],
    "documents": ["source", "lang"], "embeddings": ["label"],
}


def main() -> None:
    if len(sys.argv) != 4 or sys.argv[2] not in (
            "decimal", "uint", "binary", "hive", "nanos", "bss", "lz4",
            "gzip", "duckdb", "extracol", "delta", "brotli", "torn"):
        sys.exit(__doc__)
    src, variant, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    os.makedirs(dst, exist_ok=True)
    for i, name in enumerate(sorted(os.listdir(src))):
        if not name.endswith(".parquet"):
            continue
        if variant == "torn":
            # byte-level damage — never goes through a parquet reader
            out = os.path.join(dst, name)
            if os.path.isdir(out):
                import shutil
                shutil.rmtree(out)
            with open(os.path.join(src, name), "rb") as fh:
                raw = fh.read()
            shape = i % 3
            if shape == 0:
                torn, desc = raw[: max(12, (len(raw) * 6) // 10)], "truncated to 60%"
            elif shape == 1:
                torn, desc = raw[:-4] + b"XXXX", "footer magic overwritten"
            else:
                at, cut = len(raw) // 3, min(4096, len(raw) // 4)
                torn = raw[:at] + raw[at + cut:]
                desc = f"{cut}B cut from the data region (footer kept)"
            with open(out, "wb") as fh:
                fh.write(torn)
            print(f"{name}: {desc}")
            continue
        t = pq.read_table(os.path.join(src, name))
        out = os.path.join(dst, name)
        # reruns must be idempotent ACROSS variants too: hive leaves
        # <table>.parquet as a DIRECTORY, which a later single-file
        # variant's write_table would crash into mid-loop (leaving a
        # half-drifted replica the gate would happily read); and
        # write_to_dataset APPENDS uuid-named files, silently doubling
        # rows on a hive→hive rerun. Clear the target either way.
        if os.path.isdir(out):
            import shutil
            shutil.rmtree(out)
        if variant == "hive":
            pcols = HIVE_PARTITION_COL[name[: -len(".parquet")]]
            pq.write_to_dataset(t, out, partition_cols=pcols)
            print(f"{name}: hive-partitioned by {'/'.join(pcols)}")
            continue
        if variant in ("lz4", "gzip", "brotli"):
            pq.write_table(t, out, compression=variant)
            print(f"{name}: recompressed {variant}")
            continue
        if variant == "extracol":
            # trailing so positional consumers would ALSO survive, but
            # the point is name-projection: nothing on either side may
            # read the table wholesale
            extra = pa.array(range(t.num_rows), pa.int64())
            pq.write_table(t.append_column("_r12_extra_col", extra), out)
            print(f"{name}: appended _r12_extra_col int64")
            continue
        if variant == "duckdb":
            import duckdb
            con = duckdb.connect()
            try:
                # escape single quotes defensively; COPY writes a
                # single parquet file at the target path
                s = os.path.join(src, name).replace("'", "''")
                d = out.replace("'", "''")
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{s}')) TO '{d}' "
                    "(FORMAT PARQUET)")
            finally:
                con.close()
            print(f"{name}: rewritten by DuckDB's parquet writer")
            continue
        if variant == "delta":
            # per-leaf DELTA encodings (top-level primitives and
            # list<primitive> leaves — the same dotted-path addressing
            # the bss mode uses). pyarrow requires dictionary OFF where
            # an explicit encoding is set; v2 data pages are where
            # writers that pick DELTA by default put them.
            def delta_enc(typ):
                if (pa.types.is_integer(typ) or pa.types.is_timestamp(typ)
                        or pa.types.is_date(typ)):
                    return "DELTA_BINARY_PACKED"
                if (pa.types.is_string(typ) or pa.types.is_large_string(typ)
                        or pa.types.is_binary(typ) or pa.types.is_large_binary(typ)):
                    return "DELTA_BYTE_ARRAY"
                return "PLAIN"  # floats/bools: no DELTA form
            enc = {}
            for f in t.schema:
                if pa.types.is_list(f.type):
                    enc[f"{f.name}.list.element"] = delta_enc(f.type.value_type)
                else:
                    enc[f.name] = delta_enc(f.type)
            pq.write_table(t, out, use_dictionary=False, column_encoding=enc,
                           version="2.6", data_page_version="2.0")
            deltas = sorted(k for k, v in enc.items() if v != "PLAIN")
            print(f"{name}: DELTA-encoded {len(deltas)} leaf/leaves: "
                  f"{', '.join(deltas) or '-'}")
            continue
        if variant == "bss":
            # top-level float columns AND nested list<float> leaves
            # (embeddings.embedding — the boolean form of
            # use_byte_stream_split hits nested leaves too, so the
            # rehearsal must): dotted leaf paths address them
            dcols = []
            for f in t.schema:
                if pa.types.is_floating(f.type):
                    dcols.append(f.name)
                elif (pa.types.is_list(f.type)
                      and pa.types.is_floating(f.type.value_type)):
                    dcols.append(f"{f.name}.list.element")
            if dcols:
                # dictionary off wholesale: dict pages would mask BSS,
                # and the no-dictionary layout is already pinned
                # latitude (LayoutEncodingSpec's v2 variant)
                pq.write_table(t, out, use_byte_stream_split=dcols,
                               use_dictionary=False)
            else:
                pq.write_table(t, out)
            print(f"{name}: BYTE_STREAM_SPLIT on {', '.join(dcols) or '-'}")
            continue
        schema = pa.schema([recode(variant, f) for f in t.schema])
        changed = [f.name for f, g in zip(t.schema, schema) if f.type != g.type]
        # nanos needs parquet format >= 2.6 (the TIMESTAMP(NANOS)
        # annotation) — older targets silently coerce ns back to us and
        # the variant would rehearse nothing
        kwargs = ({"version": "2.6", "coerce_timestamps": None}
                  if variant == "nanos" else {})
        pq.write_table(t.cast(schema), out, **kwargs)
        print(f"{name}: recoded {len(changed)} column(s): {', '.join(changed) or '-'}")


if __name__ == "__main__":
    main()
