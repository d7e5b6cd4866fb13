"""Synthesize a larger scale factor from driver-generated sf0.1 parquet.

The driver ships sf{0.001,0.01,0.1}; scale evidence past sf0.1 needs a
local derivative. This replicates every FACT table R times (default 5 →
"sf0.5") with per-replica key-domain shifts so referential integrity
holds (o_custkey still hits customer, l_orderkey still hits orders).
Dimension tables (region, nation) keep their fixed cardinality, as they
would at any real TPC-H scale.

Two perturbations keep the *data distribution* constant so the scaling
curve measures the engine, not a changed workload:

- documents.text: replicas > 0 get a replica-specific alphanumeric
  suffix appended to EVERY word — a bijection on the word (and hence
  shingle) space, so within-replica near-dup structure is preserved
  exactly while cross-replica copies share ZERO words or shingles.
  Anything weaker leaks: a salt spliced every N words leaves 1-in-N+1
  shingles unsalted, and those shared rare shingles make every
  cross-replica copy-pair an inverted-index/SimHash candidate —
  candidate volume then grows quadratically in R (observed: 17–26×
  runtime at R=5), which measures the contamination, not the engine.
- embeddings.embedding: replicas > 0 get a deterministic unit-noise
  vector (seeded by replica id) added at half the mean norm, pushing
  cross-replica cosine well below near-dup thresholds for the same
  reason.

Output goes to .scale/sf0.5 inside the repo (gitignored). Deterministic:
same input → byte-identical output.

Usage: python tools/make_sf_scale.py [--src /root/testdata/sf0.1]
                                     [--dest .scale/sf0.5] [--replicas 5]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Tables copied through unchanged (fixed-cardinality dimensions).
DIM_TABLES = ["region", "nation"]

# table -> {column: key_domain} ; every column in one domain shifts by
# that domain's offset so foreign keys stay aligned across replicas.
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

# key domain -> (table, column) holding its max value
DOMAIN_SOURCE = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}

ROW_GROUP_SIZE = 131072  # multiple row groups at sf0.5 → realistic pruning


def _salt_text(text: str, salt: str) -> str:
    if text is None:
        return text
    return " ".join(w + salt if w else w for w in text.split(" "))


def _perturb_documents(tbl: pa.Table, k: int) -> pa.Table:
    salt = f"0r{k}"  # alphanumeric: survives [^a-z0-9] normalizers in-token
    texts = tbl.column("text").to_pylist()
    salted = [_salt_text(t, salt) for t in texts]
    idx = tbl.schema.get_field_index("text")
    return tbl.set_column(idx, "text", pa.array(salted, type=pa.string()))


def _perturb_embeddings(tbl: pa.Table, k: int) -> pa.Table:
    col = tbl.column("embedding").combine_chunks()
    arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(arr.values.to_numpy(zero_copy_only=False), dtype=np.float32)
    offsets = np.asarray(arr.offsets.to_numpy(zero_copy_only=False))
    dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
    if dim and np.all(np.diff(offsets) == dim):
        mat = flat.reshape(-1, dim)
        rng = np.random.RandomState(1234 + k)
        noise = rng.standard_normal(dim).astype(np.float32)
        noise /= np.linalg.norm(noise)
        scale = 0.5 * float(np.mean(np.linalg.norm(mat, axis=1)))
        mat = mat + scale * noise  # same shift per replica: in-replica geometry kept
        new = pa.array(list(mat), type=pa.list_(pa.float32()))
    else:  # ragged lists: per-row fallback
        rng = np.random.RandomState(1234 + k)
        rows = arr.to_pylist()
        new_rows = []
        for r in rows:
            if r is None:
                new_rows.append(None)
                continue
            v = np.asarray(r, dtype=np.float32)
            n = rng.standard_normal(len(v)).astype(np.float32)
            n /= max(np.linalg.norm(n), 1e-9)
            new_rows.append((v + 0.5 * np.linalg.norm(v) * n).tolist())
        new = pa.array(new_rows, type=pa.list_(pa.float32()))
    idx = tbl.schema.get_field_index("embedding")
    return tbl.set_column(idx, "embedding", new)


def scale_dir(src: str, dest: str, replicas: int) -> None:
    os.makedirs(dest, exist_ok=True)
    offsets = {}
    for dom, (t, c) in DOMAIN_SOURCE.items():
        col = pq.read_table(os.path.join(src, f"{t}.parquet"), columns=[c])[c]
        offsets[dom] = int(pc.max(col).as_py()) + 1

    for t in DIM_TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(tbl, os.path.join(dest, f"{t}.parquet"))
        print(f"{t}: copied {tbl.num_rows} rows (dimension)")

    for t, keycols in KEYED.items():
        base = pq.read_table(os.path.join(src, f"{t}.parquet"))
        parts = []
        for k in range(replicas):
            tbl = base
            if k > 0:
                for col, dom in keycols.items():
                    idx = tbl.schema.get_field_index(col)
                    typ = tbl.schema.field(col).type
                    shifted = pc.add(tbl.column(col), k * offsets[dom])
                    tbl = tbl.set_column(idx, col, pc.cast(shifted, typ))
                if t == "documents":
                    tbl = _perturb_documents(tbl, k)
                elif t == "embeddings":
                    tbl = _perturb_embeddings(tbl, k)
            parts.append(tbl)
        out = pa.concat_tables(parts)
        pq.write_table(
            out, os.path.join(dest, f"{t}.parquet"), row_group_size=ROW_GROUP_SIZE
        )
        print(f"{t}: {base.num_rows} -> {out.num_rows} rows")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default=os.path.join(REPO, ".scale", "sf0.5"))
    ap.add_argument("--replicas", type=int, default=5)
    args = ap.parse_args()
    scale_dir(args.src, args.dest, args.replicas)


if __name__ == "__main__":
    main()
