#!/usr/bin/env python3
"""Build a scaled benchmark dataset by replicating a source SF directory.

Usage: python3 tools/make_scaled_sf.py <src_sf_dir> <out_dir> <factor> [tables]

[tables]: optional comma-separated subset (e.g. "documents,embeddings")
for spot-benches that only read a few tables — a factor-100 lineitem
build is minutes of work a d3/d7/sim3 spot-bench never touches.

Bench-only tooling (driver-side python, like tools/check_oracle.py): the
correctness gate always runs on the driver's own testdata. This exists to
measure the suite at ~sf1 (10x sf0.1) — the "job floor amortizes away at
scale" claim needs a measurement at the largest data we can build locally.

Replication rules:
  - region/nation are bounded dimensions: copied once, never replicated
    (matches TPC-H, where they are constant across SF).
  - every other table is unioned <factor> times with its key columns
    shifted by replica * stride, so intra-replica join relationships
    (orders.o_custkey -> customer.c_custkey, lineitem.l_orderkey ->
    orders.o_orderkey, ...) stay intact and join/group cardinalities
    scale linearly.
  - stride per table = next power of 10 above the max key, kept SMALL on
    purpose: doc_id/vec_id pairs are packed into one int64 downstream with
    an overflow guard at 1e9 — ids must stay well below that.
  - embeddings get a tiny deterministic per-replica perturbation
    (+replica*1e-4 on every component) so near-dup queries see realistic
    near-duplicates instead of a pathological 10-way exact-duplicate
    blowup; documents text is intentionally left identical (exact-dedup
    work should scale with the data).
  - pyarrow (not DuckDB) so the physical parquet types survive verbatim —
    events.ts is TIMESTAMP(NANOS), which the Spark reader contract
    (nanosAsLong) depends on.
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
import os

# column -> key family; every column in a family shifts by the SAME stride
# so foreign keys keep referencing the matching replica's primary keys.
FAMILY = {
    "c_custkey": "custkey", "o_custkey": "custkey",
    "s_suppkey": "suppkey", "l_suppkey": "suppkey",
    "p_partkey": "partkey", "l_partkey": "partkey",
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "event_id": "event", "user_id": "user",
    "doc_id": "doc", "vec_id": "vec", "label": "label",
}
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id", "label"],
}
COPY_ONCE = ["region", "nation"]


def family_strides(src):
    """Next power of 10 above the max key observed ACROSS the family."""
    fmax = {}
    for name, keys in KEYS.items():
        t = pq.read_table(f"{src}/{name}.parquet", columns=keys)
        for k in keys:
            fam = FAMILY[k]
            fmax[fam] = max(fmax.get(fam, 0), pc.max(t.column(k)).as_py() or 0)
    strides = {}
    for fam, m in fmax.items():
        s = 10
        while s <= m:
            s *= 10
        strides[fam] = s
    return strides


def perturb_embeddings(table: pa.Table, rep: int) -> pa.Table:
    """Apply a per-replica SIGNED PERMUTATION (rotate by rep % dim, then
    flip signs under a replica-seeded deterministic mask). Signed
    permutations are orthogonal, so WITHIN a replica all inner products —
    and therefore the near-dup pair structure — are preserved exactly
    (pair counts scale linearly with the factor), while distinct replicas
    are mutually near-orthogonal, so no cross-replica near-dup clique
    appears. A tiny additive perturbation instead would make every vector
    a factor-way near-duplicate (quadratic pair blowup); pure rotation
    wraps at factor == dim, reproducing replica 0 exactly — the sign mask
    (collision probability 2^-dim per pair of replicas) removes that
    ceiling, so factors beyond the embedding dim (sf10 = 100x) stay
    sound."""
    if rep == 0:
        return table
    import numpy as np
    col = table.column("embedding").combine_chunks()
    offsets = col.offsets.to_numpy()
    lens = set(offsets[1:] - offsets[:-1])
    assert len(lens) == 1, f"ragged embedding dims: {lens}"
    dim = lens.pop()
    vals = col.values.to_numpy(zero_copy_only=False).reshape(-1, dim)
    signs = (np.random.RandomState(rep).randint(0, 2, dim) * 2 - 1
             ).astype(np.float32)
    rolled = (np.roll(vals, rep % dim, axis=1) * signs).reshape(-1)
    new = pa.ListArray.from_arrays(col.offsets,
                                   pa.array(rolled, pa.float32()))
    i = table.schema.get_field_index("embedding")
    return table.set_column(i, table.schema.field(i), new)


def main():
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    subset = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    os.makedirs(out, exist_ok=True)
    for name in COPY_ONCE:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{out}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows (copied once)")
    strides = family_strides(src)
    print("family strides:", strides)
    for name, keys in KEYS.items():
        if subset is not None and name not in subset:
            continue
        t = pq.read_table(f"{src}/{name}.parquet")
        reps = []
        for rep in range(factor):
            r = t
            for k in keys:
                i = r.schema.get_field_index(k)
                shifted = pc.add(r.column(k),
                                 pa.scalar(rep * strides[FAMILY[k]], r.schema.field(i).type))
                r = r.set_column(i, r.schema.field(i), shifted)
            if name == "embeddings":
                r = perturb_embeddings(r, rep)
            reps.append(r)
        big = pa.concat_tables(reps)
        # Row groups sized to the bench's 2 MB scan split: Spark's scan
        # parallelism is #row-groups, not #splits — a 170 MB documents
        # file written as 3×200K-row groups ran x15's signature kernel on
        # 3 of 32 cores (14 s) while the identical plan over split-matched
        # row groups used all 32 (4 s). Real deployments write many
        # split-sized files, so small row groups here is what makes the
        # local measurement faithful to the 100-TB plan shape.
        rows_per_2mb = max(1000, int(big.num_rows * 2_000_000 /
                                     max(1, big.nbytes)))
        pq.write_table(big, f"{out}/{name}.parquet",
                       row_group_size=min(200_000, rows_per_2mb))
        print(f"{name}: {t.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    main()
