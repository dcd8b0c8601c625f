#!/usr/bin/env python3
"""Driver-side tooling (like check_oracle.py — not part of the Scala lib):
replicate a testdata SF dir N-fold with shifted keys, for one-off scaling
probes (BASELINE.md records the sf0.1 -> 10x ratios). Text/embedding
payloads repeat verbatim — the probe measures data-volume scaling, not
entropy growth.

Covers BOTH table families:
  - corpus tables (documents / embeddings / events): self-keyed shifts;
  - relational tables (customer / supplier / part / orders / lineitem):
    FK-CONSISTENT shifts — each foreign key shifts by its PARENT table's
    key range, so replica k's orders reference replica k's customers and
    replica k's lineitems reference replica k's orders/parts/suppliers
    (referential integrity holds at every factor; dq_audit's FK checks
    stay green on the scaled dir);
  - nation / region: tiny fixed dims, copied verbatim (unshifted
    c_nationkey / s_nationkey FKs stay valid against them).

Usage: python3 tools/make_scale.py <srcSfDir> <dstDir> [factor=10]
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column -> (basis_table, basis_column)}: the column shifts by
# k * (max(basis) + 1), so FK columns use their PARENT's key range.
SHIFT = {
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
    "events": {"event_id": ("events", "event_id"),
               "user_id": ("events", "user_id")},
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {"o_orderkey": ("orders", "o_orderkey"),
               "o_custkey": ("customer", "c_custkey")},
    "lineitem": {"l_orderkey": ("orders", "o_orderkey"),
                 "l_partkey": ("part", "p_partkey"),
                 "l_suppkey": ("supplier", "s_suppkey")},
}
COPY = ["region", "nation"]


def main(src, dst, factor):
    os.makedirs(dst, exist_ok=True)
    bases = {}  # (tbl, col) -> max+1 in the SOURCE dir

    def basis(tbl, col):
        if (tbl, col) not in bases:
            t = pq.read_table(f"{src}/{tbl}.parquet", columns=[col])
            bases[(tbl, col)] = pc.max(t[col]).as_py() + 1
        return bases[(tbl, col)]

    for tbl in COPY:
        shutil.copyfile(f"{src}/{tbl}.parquet", f"{dst}/{tbl}.parquet")
        print(f"{tbl}: copied verbatim")
    for tbl, keys in SHIFT.items():
        t = pq.read_table(f"{src}/{tbl}.parquet")
        parts = []
        for k in range(factor):
            arrays = []
            for name in t.column_names:
                col = t[name]
                if name in keys and k > 0:
                    col = pc.add(col, k * basis(*keys[name]))
                arrays.append(col)
            parts.append(pa.Table.from_arrays(arrays, schema=t.schema))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{tbl}.parquet")
        print(f"{tbl}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
