#!/usr/bin/env python3
"""Build the text_compression oracle fixture (driver-side tooling, like
check_oracle.py — not part of the Scala library).

DuckDB has no deflate scalar, so the oracle for deflate-derived columns
joins a pre-computed fixture instead: md5(text) -> deflate_bytes, computed
HERE with PYTHON's zlib (level 6) — an independent runtime from the JVM
Deflater the Spark side uses (verified byte-identical on this corpus:
zlib 1.2.13 both sides), so the oracle row is a genuine cross-
implementation check, not a copy of the Spark output.

Content-addressed by md5(text) rather than doc_id so the fixture works at
every SF dir whose texts it covers and survives doc_id reshuffling; a
testdata regeneration with NEW text content surfaces as a loud row-count
mismatch in the correctness gate (the same failure mode as any other
content drift).

Usage: python3 tools/make_compression_fixture.py [outPath]
"""
import hashlib
import sys
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]


def main(out):
    seen = {}
    for d in SF_DIRS:
        t = pq.read_table(f"{d}/documents.parquet", columns=["text"])
        for text in t["text"].to_pylist():
            raw = text.encode("utf-8")
            key = hashlib.md5(raw).hexdigest()
            if key not in seen:
                c = zlib.compressobj(6)
                seen[key] = len(c.compress(raw) + c.flush())
    tbl = pa.Table.from_arrays(
        [pa.array(list(seen.keys()), pa.string()),
         pa.array(list(seen.values()), pa.int64())],
        names=["text_md5", "deflate_bytes"])
    pq.write_table(tbl, out)
    print(f"{out}: {tbl.num_rows} distinct texts "
          f"(zlib {zlib.ZLIB_RUNTIME_VERSION})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "fixtures/compression_oracle.parquet")
