"""Derived scale-up of the driver's sf0.1 testdata (VERDICT r9 ask #2).

The driver ships sf{0.001,0.01,0.1}; the design target is ~100 TB. To
MEASURE (not assert) how query time scales with data, this generates a
10x corpus at ``testdata_sf1/`` (gitignored) derived deterministically
from sf0.1 — same schemas, same per-replica distributions, FK graph
intact — so ``tools/scaling_bench.py`` can fit per-query scaling
exponents log10(t_sf1 / t_sf0.1).

Construction (seedless — pure functions of the source data):
- region/nation: copied (TPC-H keeps fixed-size dims fixed).
- customer/supplier/part/orders/lineitem: 10 replicas; every PK and
  every FK *to a scaled table* is shifted by ``replica * stride`` with
  stride = max(key)+1 of the SOURCE table, so replica i's orders join
  replica i's customers — join selectivities and group cardinalities
  scale exactly like the data.
- events: event_id/user_id shifted the same way (10x users, identical
  per-user series shape; per-day volume 10x — the realistic way a
  stream grows).
- documents: doc_id shifted; replica 0 keeps the original text, every
  other replica WORD-SHUFFLES it with a per-(doc, replica) md5-seeded
  Fisher-Yates. A verbatim copy would plant a 10-clique of exact/near
  duplicates on every doc and quadratically distort every dedup/LSH
  query's sf1 cost; shuffling preserves unigram statistics (langid,
  quality, token counts stay representative) while destroying the
  n-gram shingles dedup keys on.
- embeddings: vec_id shifted; replica i's vector is the original
  cyclically rotated by i components — norms and within-replica
  pairwise geometry are preserved exactly, cross-replica similarity is
  decorrelated, so ANN/kNN candidate structure scales instead of
  collapsing into planted duplicate clusters.

Run: ``python tools/gen_scale.py [--factor 10] [--out testdata_sf1]``
(~1-2 min, pyarrow+numpy only — no Spark needed).
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _shift(col: pa.ChunkedArray, stride: int, rep: int) -> pa.Array:
    a = col.combine_chunks().to_numpy(zero_copy_only=False)
    return pa.array(a + stride * rep, type=col.type)


def _stride(tbl: pa.Table, col: str) -> int:
    a = tbl.column(col).combine_chunks().to_numpy(zero_copy_only=False)
    return int(a.max()) + 1


def _replicate(
    tbl: pa.Table, factor: int, shifted: dict[str, int]
) -> pa.Table:
    """Concat `factor` replicas, shifting each column in `shifted` by
    replica * stride; all other columns repeat verbatim."""
    reps = []
    for i in range(factor):
        cols = []
        for name in tbl.column_names:
            c = tbl.column(name)
            if name in shifted and i > 0:
                cols.append(_shift(c, shifted[name], i))
            else:
                cols.append(c.combine_chunks())
        reps.append(pa.table(cols, names=tbl.column_names))
    return pa.concat_tables(reps)


def _shuffle_words(text: str, seed_bytes: bytes) -> str:
    words = text.split()
    n = len(words)
    if n < 2:
        return text
    # md5-seeded Fisher-Yates: deterministic, replica-and-doc specific
    rng = np.random.Generator(
        np.random.PCG64(int.from_bytes(seed_bytes[:8], "big"))
    )
    perm = rng.permutation(n)
    return " ".join(words[j] for j in perm)


def gen(out_dir: str, factor: int) -> None:
    os.makedirs(out_dir, exist_ok=True)

    t = {
        n: pq.read_table(os.path.join(SRC, f"{n}.parquet"))
        for n in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    }
    sc = _stride(t["customer"], "c_custkey")
    ss = _stride(t["supplier"], "s_suppkey")
    sp = _stride(t["part"], "p_partkey")
    so = _stride(t["orders"], "o_orderkey")
    se = _stride(t["events"], "event_id")
    su = _stride(t["events"], "user_id")
    sd = _stride(t["documents"], "doc_id")
    sv = _stride(t["embeddings"], "vec_id")

    plans: dict[str, dict[str, int]] = {
        "customer": {"c_custkey": sc},
        "supplier": {"s_suppkey": ss},
        "part": {"p_partkey": sp},
        "orders": {"o_orderkey": so, "o_custkey": sc},
        "lineitem": {"l_orderkey": so, "l_partkey": sp, "l_suppkey": ss},
        "events": {"event_id": se, "user_id": su},
    }
    for n in ("region", "nation"):
        pq.write_table(t[n], os.path.join(out_dir, f"{n}.parquet"))
        print(f"{n}: copied ({t[n].num_rows} rows)")
    for n, shifted in plans.items():
        out = _replicate(t[n], factor, shifted)
        pq.write_table(out, os.path.join(out_dir, f"{n}.parquet"))
        print(f"{n}: {t[n].num_rows} -> {out.num_rows}")

    # documents: shift ids, word-shuffle replicas 1..f-1
    docs = t["documents"]
    ids = docs.column("doc_id").combine_chunks().to_numpy(
        zero_copy_only=False
    )
    texts = docs.column("text").combine_chunks().to_pylist()
    reps = [docs]
    for i in range(1, factor):
        new_texts = [
            _shuffle_words(
                txt,
                hashlib.md5(f"{did}:{i}".encode()).digest(),
            )
            if txt is not None
            else None
            for did, txt in zip(ids, texts)
        ]
        cols = []
        for name in docs.column_names:
            if name == "doc_id":
                cols.append(pa.array(ids + sd * i, type=pa.int64()))
            elif name == "text":
                cols.append(pa.array(new_texts, type=pa.string()))
            elif name == "n_chars":
                cols.append(
                    pa.array(
                        [len(x) if x is not None else None
                         for x in new_texts],
                        type=pa.int64(),
                    )
                )
            else:
                cols.append(docs.column(name).combine_chunks())
        reps.append(pa.table(cols, names=docs.column_names))
    docs_out = pa.concat_tables(reps)
    pq.write_table(docs_out, os.path.join(out_dir, "documents.parquet"))
    print(f"documents: {docs.num_rows} -> {docs_out.num_rows}")

    # embeddings: shift ids, rotate vector by replica index
    emb = t["embeddings"]
    vids = emb.column("vec_id").combine_chunks().to_numpy(
        zero_copy_only=False
    )
    vecs = emb.column("embedding").combine_chunks()
    flat = vecs.values.to_numpy(zero_copy_only=False)
    dim = len(flat) // len(emb)
    mat = flat.reshape(len(emb), dim)
    labels = emb.column("label").combine_chunks()
    reps = [emb]
    for i in range(1, factor):
        rot = np.roll(mat, i % dim, axis=1).astype(np.float32)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(rot.ravel(), type=pa.float32()), dim
        ).cast(pa.list_(pa.float32()))
        reps.append(
            pa.table(
                {
                    "vec_id": pa.array(vids + sv * i, type=pa.int64()),
                    "embedding": arr,
                    "label": labels,
                }
            )
        )
    emb_out = pa.concat_tables(reps)
    pq.write_table(emb_out, os.path.join(out_dir, "embeddings.parquet"))
    print(f"embeddings: {emb.num_rows} -> {emb_out.num_rows}")


def main() -> int:
    args = sys.argv[1:]
    factor = 10
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf1",
    )
    if "--factor" in args:
        factor = int(args[args.index("--factor") + 1])
    if "--out" in args:
        out = args[args.index("--out") + 1]
    gen(out, factor)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
