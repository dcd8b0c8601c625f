#!/usr/bin/env python3
"""Driver-side tooling (like check_oracle.py — not part of the Scala lib):
replicate the documents / embeddings / events tables of a testdata SF dir
N-fold with shifted ids, for one-off scaling probes (BASELINE.md records
the sf0.1 -> 10x ratios). Text/embedding payloads repeat verbatim — the
probe measures data-volume scaling, not entropy growth.

Usage: python3 tools/make_scale.py <srcSfDir> <dstDir> [factor=10]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}


def main(src, dst, factor):
    os.makedirs(dst, exist_ok=True)
    for tbl, keys in SHIFT.items():
        t = pq.read_table(f"{src}/{tbl}.parquet")
        maxs = {k: pc.max(t[k]).as_py() + 1 for k in keys}
        parts = []
        for k in range(factor):
            arrays = []
            for name in t.column_names:
                col = t[name]
                if name in keys and k > 0:
                    col = pc.add(col, k * maxs[name])
                arrays.append(col)
            parts.append(pa.Table.from_arrays(arrays, schema=t.schema))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{tbl}.parquet")
        print(f"{tbl}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
