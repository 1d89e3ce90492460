#!/usr/bin/env python3
"""Local fixture generators for scale/skew experiments (builder tooling,
not engine code — same footing as check_oracle.py).

Usage:
  gen_scale.py sf1  <src_sf_dir> <out_dir>   # 10x documents/embeddings/events
  gen_scale.py skew <src_sf_dir> <out_dir>   # adversarial hot-key corpus

sf1: tiles the source tables 10x while preserving the source's internal
similarity structure and keeping the copies mutually disjoint:
 - documents: copy c>0 rewrites every word through a copy-specific random
   permutation of the corpus vocabulary. Intra-copy shingle/jaccard
   structure is preserved EXACTLY (renaming is a bijection); inter-copy
   overlap collapses to permutation fixed points (~1/|V|). So pair counts
   scale linearly, like a genuinely 10x-bigger corpus of the same
   distribution — not quadratically, as naive replication would.
 - embeddings: copy c>0 applies a copy-specific signed coordinate
   permutation (an orthogonal transform): intra-copy cosines are exactly
   preserved, inter-copy cosines are randomized.
 - events: ids/users offset per copy; timestamps kept (denser traffic).
 - TPC-H fact/dim tables (customer/supplier/part/orders/lineitem): tiled
   10x with RI-consistent key offsets — copy c adds c*(max_key+1) to
   every primary AND foreign key occurrence, so each copy is a disjoint,
   internally-consistent TPC-H slice (exactly how a genuinely 10x SF
   behaves: the customer<->supplier trade graph gains 10x disjoint
   nodes/edges, joins stay linear, and no cross-copy key ever matches).
   Non-key columns (dates, prices, names) repeat — the distribution a
   bigger SF would also keep. This closes the round-8 scale-gate blind
   spot: queries whose hot side is the orders x lineitem edge list
   (g1/g1b/g2/d5 family) now face a real x10 input. region/nation stay
   symlinked at source scale — TPC-H itself holds them FIXED at every
   scale factor (5/25 rows), so scaling them would distort, not stress.

skew: same scale as the source, but 20% of docs are prefixed with one
shared 40-word template paragraph and moved to one hot source key, and
20% of embeddings are pulled to within ~0.95 cosine of one hot direction
— the boilerplate/hot-shard shape that breaks uncapped similarity joins.
"""
import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

COPIES = 10


def load(src, name):
    return pq.read_table(f"{src}/{name}.parquet")


def write(out, name, table):
    os.makedirs(out, exist_ok=True)
    pq.write_table(table, f"{out}/{name}.parquet")


def gen_sf1(src, out):
    docs = load(src, "documents")
    d = docs.to_pydict()
    n = len(d["doc_id"])
    vocab = sorted({w for t in d["text"] for w in t.split(" ")})
    cols = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
    for c in range(COPIES):
        if c == 0:
            mapping = None
        else:
            rng = random.Random(1000 + c)
            perm = vocab[:]
            rng.shuffle(perm)
            mapping = dict(zip(vocab, perm))
        for i in range(n):
            t = d["text"][i]
            if mapping is not None:
                t = " ".join(mapping[w] for w in t.split(" "))
            cols["doc_id"].append(d["doc_id"][i] + c * n)
            cols["text"].append(t)
            cols["lang"].append(d["lang"][i])
            cols["source"].append(d["source"][i])
            cols["n_chars"].append(len(t))
    write(out, "documents", pa.table(cols, schema=docs.schema))

    emb = load(src, "embeddings")
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    ids = np.array(emb.column("vec_id").to_pylist())
    labels = np.array(emb.column("label").to_pylist(), dtype=np.int32)
    ne, dim = vecs.shape
    out_ids, out_vecs, out_labels = [], [], []
    for c in range(COPIES):
        rng = np.random.RandomState(2000 + c)
        if c == 0:
            v = vecs
        else:
            perm = rng.permutation(dim)
            signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
            v = vecs[:, perm] * signs
        out_ids.append(ids + c * ne)
        out_vecs.append(v)
        out_labels.append(labels)
    write(out, "embeddings", pa.table({
        "vec_id": np.concatenate(out_ids),
        "embedding": pa.array(list(np.concatenate(out_vecs)), type=emb.schema.field("embedding").type),
        "label": np.concatenate(out_labels),
    }, schema=emb.schema))

    ev = load(src, "events")
    evd = ev.to_pydict()
    nv = len(evd["event_id"])
    max_user = max(evd["user_id"]) + 1
    cols = {k: [] for k in evd}
    for c in range(COPIES):
        for k in evd:
            if k == "event_id":
                cols[k].extend(x + c * nv for x in evd[k])
            elif k == "user_id":
                cols[k].extend(x + c * max_user for x in evd[k])
            else:
                cols[k].extend(evd[k])
    write(out, "events", pa.table(cols, schema=ev.schema))

    # TPC-H fact/dim tiling: disjoint RI-consistent copies via key offsets.
    # Vectorized (pyarrow.compute) — lineitem is 6M rows at the sf0.1 base.
    import pyarrow.compute as pc

    def key_stride(table, col):
        return pc.max(table.column(col)).as_py() + 1

    # foreign keys share the stride of the table they reference, computed
    # from the REFERENCED table so orphan-free copies stay orphan-free
    kc = key_stride(load(src, "customer"), "c_custkey")
    ks = key_stride(load(src, "supplier"), "s_suppkey")
    kp = key_stride(load(src, "part"), "p_partkey")
    ko = key_stride(load(src, "orders"), "o_orderkey")

    def tile_with_strides(name, col_strides):
        t = load(src, name)
        chunks = []
        for c in range(COPIES):
            if c == 0:
                chunks.append(t)
                continue
            cols = []
            for field in t.schema:
                col = t.column(field.name)
                if field.name in col_strides:
                    col = pc.cast(pc.add(col, col_strides[field.name] * c), field.type)
                cols.append(col)
            chunks.append(pa.table(dict(zip(t.schema.names, cols)), schema=t.schema))
        write(out, name, pa.concat_tables(chunks))

    tile_with_strides("customer", {"c_custkey": kc})
    tile_with_strides("supplier", {"s_suppkey": ks})
    tile_with_strides("part", {"p_partkey": kp})
    tile_with_strides("orders", {"o_orderkey": ko, "o_custkey": kc})
    tile_with_strides("lineitem", {"l_orderkey": ko, "l_partkey": kp, "l_suppkey": ks})

    # region/nation: FIXED at every TPC-H scale factor (5/25 rows) — the
    # broadcast dims a real x10 would also leave untouched
    for t in ["region", "nation"]:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{src}/{t}.parquet", dst)


def gen_skew(src, out):
    docs = load(src, "documents")
    d = docs.to_pydict()
    n = len(d["doc_id"])
    vocab = sorted({w for t in d["text"] for w in t.split(" ")})
    rng = random.Random(7)
    template = " ".join(rng.choice(vocab) for _ in range(40))
    cols = {k: list(v) for k, v in d.items()}
    for i in range(n):
        if d["doc_id"][i] % 5 == 0:  # 20% boilerplate-heavy docs, one hot source
            cols["text"][i] = template + " " + d["text"][i]
            cols["source"][i] = "src0"
            cols["n_chars"][i] = len(cols["text"][i])
    write(out, "documents", pa.table(cols, schema=docs.schema))

    emb = load(src, "embeddings")
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    ids = np.array(emb.column("vec_id").to_pylist())
    rs = np.random.RandomState(7)
    hot = rs.randn(vecs.shape[1]).astype(np.float32)
    hot /= np.linalg.norm(hot)
    mask = ids % 5 == 0  # 20% of vectors collapse toward one direction
    norms = np.linalg.norm(vecs[mask], axis=1, keepdims=True)
    unit = vecs[mask] / norms
    vecs[mask] = ((0.95 * hot + 0.05 * unit) * norms).astype(np.float32)
    write(out, "embeddings", pa.table({
        "vec_id": ids,
        "embedding": pa.array(list(vecs), type=emb.schema.field("embedding").type),
        "label": emb.column("label"),
    }, schema=emb.schema))


if __name__ == "__main__":
    mode, src, out = sys.argv[1], sys.argv[2], sys.argv[3]
    {"sf1": gen_sf1, "skew": gen_skew}[mode](src, out)
    print(f"{mode} fixture written to {out}")
