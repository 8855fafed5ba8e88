#!/usr/bin/env python3
"""Deterministic 10x upsample of an sf dir (default sf0.1 -> /tmp/sf1)
for the full-board scale-correctness sweep. Rebuilt from the round-12
recipe (ENGINE.md "Round-12 sf1 sweep") and committed this time so the
generator survives /tmp cleanup.

Construction (copy i in 0..9; copy 0 is byte-identical to the source):
 - TPC-H tables replicate with per-copy key offsets, FK-consistent:
   the SAME offset (i * 10_000_000) is applied to every occurrence of
   a key domain (orderkey, custkey, suppkey, partkey), so every join
   path present at sf0.1 exists per-copy at sf1. nation/region are
   fixed-cardinality dimensions and are NOT replicated; nationkey /
   regionkey FKs are left untouched.
 - events: event_id offsets per copy; ts shifts by i*37 WHOLE seconds
   (second-truncation in Tables.read commutes with the shift); copies
   5..9 REUSE the copy-0 user_id space (per-user density stress for
   sessionization/debounce/funnel) while copies 1..4 get fresh users.
 - documents: near-dup copies — per-copy suffix token appended to the
   text (so cross-copy pairs are near-dups, within-copy structure is
   preserved), doc_id offset 1_000_000 per copy (stays well under the
   10^8 injected-id offset used by the dedup-incr fixtures), n_chars
   recomputed so the length-column invariant holds.
 - embeddings: vec_id offsets per copy; first vector component gets a
   per-copy +i*1e-3 perturbation (copies are near- but not exact-dup
   in embedding space).

Both Spark and the DuckDB oracles read the SAME output parquet, so any
deterministic construction yields a valid correctness compare; this one
additionally preserves the semantic regimes (FK joins, per-user
density, near-dup families) the operators are sensitive to.
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

KEY_OFF = 10_000_000      # orderkey/custkey/suppkey/partkey/event_id/user_id
DOC_OFF = 1_000_000       # doc_id (must stay < 10^8, the incr-fixture offset)
VEC_OFF = 1_000_000       # vec_id

os.makedirs(DST, exist_ok=True)


def shift_i64(t, col, off):
    if off == 0:
        return t
    idx = t.schema.get_field_index(col)
    return t.set_column(idx, col, pc.add(t.column(col), pa.scalar(off, pa.int64())))


def copy_table(name, transform):
    src = pq.read_table(f"{SRC}/{name}.parquet")
    parts = [transform(src, i) for i in range(COPIES)]
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/{name}.parquet")
    print(f"{name}: {src.num_rows} -> {out.num_rows}")


def passthrough(name):
    src = pq.read_table(f"{SRC}/{name}.parquet")
    pq.write_table(src, f"{DST}/{name}.parquet")
    print(f"{name}: {src.num_rows} (dimension, not replicated)")


passthrough("region")
passthrough("nation")

copy_table("customer", lambda t, i: shift_i64(t, "c_custkey", i * KEY_OFF))
copy_table("supplier", lambda t, i: shift_i64(t, "s_suppkey", i * KEY_OFF))
copy_table("part", lambda t, i: shift_i64(t, "p_partkey", i * KEY_OFF))
copy_table("orders", lambda t, i: shift_i64(
    shift_i64(t, "o_orderkey", i * KEY_OFF), "o_custkey", i * KEY_OFF))


def lineitem(t, i):
    for c in ("l_orderkey", "l_partkey", "l_suppkey"):
        t = shift_i64(t, c, i * KEY_OFF)
    return t


copy_table("lineitem", lineitem)


def events(t, i):
    t = shift_i64(t, "event_id", i * KEY_OFF)
    # copies 5..9 reuse the copy-0 user space -> 6x per-user density
    user_off = i * KEY_OFF if i < 5 else 0
    t = shift_i64(t, "user_id", user_off)
    if i:
        idx = t.schema.get_field_index("ts")
        shifted = pc.add(t.column("ts"), pa.scalar(i * 37_000_000, pa.duration("us")))
        t = t.set_column(idx, "ts", shifted.cast(pa.timestamp("us")))
    return t


copy_table("events", events)


def documents(t, i):
    t = shift_i64(t, "doc_id", i * DOC_OFF)
    if i:
        idx = t.schema.get_field_index("text")
        new_text = pc.binary_join_element_wise(
            t.column("text").cast(pa.string()),
            pa.scalar(f"sfxcopy{i}"), pa.scalar(" "))
        t = t.set_column(idx, "text", new_text)
        nidx = t.schema.get_field_index("n_chars")
        t = t.set_column(nidx, "n_chars",
                         pc.utf8_length(t.column("text")).cast(pa.int64()))
    return t


copy_table("documents", documents)


def embeddings(t, i):
    t = shift_i64(t, "vec_id", i * VEC_OFF)
    if i:
        idx = t.schema.get_field_index("embedding")
        col = t.column("embedding").combine_chunks()
        assert isinstance(col, pa.ListArray) or isinstance(col, pa.ChunkedArray)
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0)
        flat = col.flatten()
        n = len(col)
        width = len(flat) // n
        assert len(flat) == n * width, "ragged embedding widths"
        import numpy as np
        vals = flat.to_numpy(zero_copy_only=False).copy()
        vals[::width] = (vals[::width].astype("float32")
                         + np.float32(i * 1e-3)).astype("float32")
        new = pa.ListArray.from_arrays(col.offsets, pa.array(vals, pa.float32()))
        t = t.set_column(idx, "embedding", new.cast(t.schema.field("embedding").type))
    return t


copy_table("embeddings", embeddings)
print(f"done -> {DST}")
