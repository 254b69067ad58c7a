#!/usr/bin/env python3
"""Regenerate the committed BROTLI parquet fixture CodecEncodingSpec
reads (src/test/resources/codec/events_brotli.parquet).

Committed as a binary because neither Spark nor parquet-java on this
classpath carries the brotli codec — the test JVM can neither write
NOR read it, which is exactly the drift class the fixture pins:
`Engine.table`/`eventStream` must fail BY NAME (table + codec + the
missing hadoop codec class) instead of one opaque FAILED_READ_FILE per
query across the whole gate (the shape the round-11 `bss` rehearsal
hit live). pyarrow ships its own brotli, so the driver-side toolchain
can produce the layout the JVM cannot.

The fixture is events-SHAPED (same columns/types as the driver table)
so both the batch (`Engine.table`) and streaming
(`StreamingIngest.eventStream`) guards are exercised on realistic
schema; values are tiny and synthetic — the spec asserts the ERROR,
never the data.

Usage: python3 scripts/gen_codec_fixture.py
"""
import os

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "codec",
                   "events_brotli.parquet")


def main() -> None:
    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(3)],
                       pa.timestamp("us")),
        "user_id": pa.array([10, 11, 12], pa.int64()),
        "event_type": pa.array(["view", "click", "view"], pa.string()),
        "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
        "props": pa.array(["{}", "{}", "{}"], pa.string()),
    })
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(t, OUT, compression="brotli")
    md = pq.ParquetFile(OUT).metadata
    codecs = {md.row_group(g).column(c).compression
              for g in range(md.num_row_groups)
              for c in range(md.num_columns)}
    assert codecs == {"BROTLI"}, codecs
    print(f"wrote {OUT} ({md.num_rows} rows, codecs {codecs})")


if __name__ == "__main__":
    main()
