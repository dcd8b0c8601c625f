#!/usr/bin/env python3
"""Driver-side tooling (like check_oracle.py — not part of the Scala lib):
replicate a testdata SF dir N-fold with shifted keys, for one-off scaling
probes (BASELINE.md records the sf0.1 -> 10x/100x ratios).

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

Flags:
  --mutate  Entropy-preserving replication. Verbatim text/embedding
            replication turns every doc into an N-way duplicate CLIQUE —
            at 100x that makes near-dup pair/triangle OUTPUT quadratic in
            the factor, so the probe would measure the data pathology,
            not the operator. Mutation keeps per-replica statistics
            (lengths, vocabulary, intra-replica near-dup structure)
            while breaking cross-replica similarity: replica k permutes
            each doc's words with a (k, word-count)-seeded shuffle
            (same-length docs share the permutation, so a replica's
            internal near-dup pairs survive; n-gram shingles across
            replicas don't), and rolls each embedding's components by k
            (norms and intra-replica cosines exact-preserved; random
            vectors decorrelate across replicas).
  --skew    Zipfian hot keys at ~20% mass, layered on the scaled output:
            events.user_id -> hottest user on every 5th event (salted
            join / sessionization skew), lineitem.l_partkey -> one hot
            part on every 5th line (copurchase basket skew), documents:
            every 5th doc gets source='hot_src' and every 5th word
            replaced by 'zipfhot' (vocab/shingle-DF skew), and — round
            14 — every 5th doc's doc_id is REMAPPED into one residue
            class so the doc_id-DERIVED key families feel the skew too
            (round-13 verdict #7: URL canonicals are f(doc_id % 100),
            media motifs f(doc_id % nm) — text skew never touched
            them). Remapped ids sit above the original range, stepped
            by lcm(300, nm): congruent mod 300 (=> ONE canonical URL
            class at 20% mass for dedup_url/url_host_stats) and mod nm
            (=> ONE image motif at 20% mass — an over-cap degenerate
            perceptual class, which dedup_media's maxBandDf must
            absorb), while staying unique and id%3-stable (=> all
            'png' modality).

Usage: python3 tools/make_scale.py <srcSfDir> <dstDir> [factor=10]
           [--mutate] [--skew]
"""
import os
import random
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column -> (basis_table, basis_column)}: the column shifts by
# k * (max(basis) + 1), so FK columns use their PARENT table's key range.
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


def permute_words(texts, k):
    """Replica-k word permutation; one cached shuffle per word count so
    same-length docs (the near-dup pairs) share it."""
    perms = {}
    out = []
    for text in texts:
        words = text.split()
        n = len(words)
        idx = perms.get(n)
        if idx is None:
            idx = list(range(n))
            random.Random((k << 20) + n).shuffle(idx)
            perms[n] = idx
        out.append(" ".join(words[i] for i in idx))
    return out


def mutate(tbl, name, k):
    if k == 0:
        return tbl
    if name == "documents":
        texts = permute_words(tbl["text"].to_pylist(), k)
        return set_cols(tbl, text=pa.array(texts, pa.string()),
                        n_chars=pa.array([len(t) for t in texts], pa.int64()))
    if name == "embeddings":
        arr = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
        rolled = np.roll(arr, k % arr.shape[1], axis=1)
        return set_cols(tbl, embedding=pa.array(list(rolled)))
    return tbl


def set_cols(tbl, **cols):
    arrays = []
    fields = []
    for f in tbl.schema:
        if f.name in cols:
            arrays.append(cols[f.name])
            fields.append(pa.field(f.name, cols[f.name].type))
        else:
            arrays.append(tbl[f.name].combine_chunks())
            fields.append(f)
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def skew(tbl, name):
    """Hot key at ~20% mass (every 5th row by position/id)."""
    if name == "events":
        user = tbl["user_id"].to_numpy().copy()
        hot = user.min()
        mask = tbl["event_id"].to_numpy() % 5 == 0
        user[mask] = hot
        return set_cols(tbl, user_id=pa.array(user, tbl["user_id"].type))
    if name == "lineitem":
        part = tbl["l_partkey"].to_numpy().copy()
        hot = part.min()
        part[np.arange(len(part)) % 5 == 0] = hot
        return set_cols(tbl, l_partkey=pa.array(part, tbl["l_partkey"].type))
    if name == "documents":
        texts = tbl["text"].to_pylist()
        srcs = tbl["source"].to_pylist()
        ids = tbl["doc_id"].to_numpy()
        for i in np.nonzero(ids % 5 == 0)[0]:
            words = texts[i].split()
            texts[i] = " ".join(
                "zipfhot" if j % 5 == 0 else w for j, w in enumerate(words))
            srcs[i] = "hot_src"
        # doc_id-derived key skew (see the --skew docstring): remap every
        # 5th row's doc_id into one residue class mod lcm(300, nm), above
        # the original id range so uniqueness holds
        new_ids = ids.copy()
        mask = np.arange(len(ids)) % 5 == 0
        n_images = int(((ids[~mask] % 3) != 1).sum()) + int(mask.sum())
        nm = max(25, n_images // 8)   # = MediaQueries.phashMotifs
        step = int(np.lcm(300, nm))
        base = (int(ids.max()) // step + 1) * step
        new_ids[mask] = base + np.arange(int(mask.sum())) * step
        return set_cols(tbl, doc_id=pa.array(new_ids, tbl["doc_id"].type),
                        text=pa.array(texts, pa.string()),
                        source=pa.array(srcs, pa.string()),
                        n_chars=pa.array([len(t) for t in texts], pa.int64()))
    return tbl


def main(src, dst, factor, do_mutate, do_skew):
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
            rep = pa.Table.from_arrays(arrays, schema=t.schema)
            if do_mutate:
                rep = mutate(rep, tbl, k)
            parts.append(rep)
        out = pa.concat_tables(parts)
        if do_skew:
            out = skew(out, tbl)
        pq.write_table(out, f"{dst}/{tbl}.parquet")
        print(f"{tbl}: {t.num_rows} -> {out.num_rows} rows"
              + (" (mutated)" if do_mutate and tbl in
                 ("documents", "embeddings") else "")
              + (" (skewed)" if do_skew and tbl in
                 ("documents", "events", "lineitem") else ""))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    main(args[0], args[1], int(args[2]) if len(args) > 2 else 10,
         "--mutate" in flags, "--skew" in flags)
