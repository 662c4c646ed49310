"""Deterministic sf1 heavy-arm corpus generator (VERDICT r15 #5).

At sf0.1/local[32] the whole bench suite is scheduling-bound (the driver's
8-core arm BEATS the 32-core arm; per-query core ratios <= 1 everywhere), so
optimization rounds lack any parallelism signal.  This script materializes a
10x corpus — "sf1" — from the deterministic sf0.1 fixtures so the ~20
heaviest queries can be benched data-bound (bench.py PARASLICE_BENCH_HEAVY=1
arm, artifact BENCH_HEAVY*.json).

Construction (pure pyarrow/numpy, no Spark, fully deterministic — no RNG):

- 10 copies of every scaling table, with every key domain offset per copy by
  a power-of-10 stride K(domain) >= 10^ceil(log10(max_key+1)) applied
  CONSISTENTLY to primary and foreign keys (custkey, orderkey, partkey,
  suppkey, event_id, user_id, doc_id==vec_id), so referential joins hold
  within every copy and never match across copies.
- region/nation stay single-copy (fixed-cardinality dims, exactly like
  TPC-H scaling); c_nationkey/s_nationkey are untouched, so each nation
  simply gains 10x members.
- documents: copy c >= 1 gets a BIJECTIVE per-copy vocabulary remap — every
  token whose md5 falls in class 0 (md5(word) % 3 == 0, position-independent)
  is suffixed "_c{c}".  Within a copy all token-set relations (shingle/bigram
  Jaccard, near-dup pairs, df ranks) are preserved EXACTLY (bijection);
  across copies the expected shared-bigram fraction is ~(2/3)^2 = 4/9, so
  cross-copy Jaccard ~0.29 stays far below every dedup threshold (0.8) and
  pair counts scale ~linearly with the corpus instead of exploding into
  10-clone groups.  n_chars is recomputed for the perturbed text.
- embeddings: copy c gets np.roll(vec, c) along the dim axis — norms and the
  coordinate distribution are exactly preserved, neighbors decorrelate
  across copies (no 10-clone cosine-1.0 groups).
- timestamps/dates/values are untouched: the corpus gets 10x rows per date
  range and 10x users, which is what a bigger deployment looks like.

Usage: python tools/gen_heavy_sf.py [out_dir] [copies]
Defaults: /root/heavydata/sf1, 10 copies from /root/testdata/sf0.1.
The output (~0.5 GB) is NOT committed; this script is the reproducible
source of truth.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

#: key columns per table, tagged with their shared domain name
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "doc"},  # doc_id == vec_id join (multimodal_join)
}


def _stride(max_key: int) -> int:
    return 10 ** math.ceil(math.log10(max_key + 2))


def _domain_strides(tables: dict[str, pa.Table]) -> dict[str, int]:
    mx: dict[str, int] = {}
    for t, cols in KEYED.items():
        for col, dom in cols.items():
            m = pc.max(tables[t][col]).as_py()
            mx[dom] = max(mx.get(dom, 0), int(m))
    return {dom: _stride(m) for dom, m in mx.items()}


_tag_cache: dict[str, bool] = {}


def _tagged(word: str) -> bool:
    v = _tag_cache.get(word)
    if v is None:
        v = int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % 3 == 0
        _tag_cache[word] = v
    return v


def _perturb_texts(texts: list[str], copy: int) -> list[str]:
    suf = f"_c{copy}"
    out = []
    for t in texts:
        out.append(
            " ".join(w + suf if _tagged(w) else w for w in t.split(" "))
        )
    return out


def _copy_table(name: str, tbl: pa.Table, copy: int, strides: dict[str, int]) -> pa.Table:
    if copy == 0:
        return tbl
    cols = {}
    for col in tbl.schema.names:
        arr = tbl[col]
        dom = KEYED.get(name, {}).get(col)
        if dom is not None:
            arr = pc.add(arr, pa.scalar(copy * strides[dom], type=arr.type))
        cols[col] = arr
    if name == "documents":
        texts = _perturb_texts(cols["text"].to_pylist(), copy)
        cols["text"] = pa.chunked_array([pa.array(texts, type=pa.string())])
        cols["n_chars"] = pa.chunked_array(
            [pa.array([len(t) for t in texts], type=pa.int64())]
        )
    if name == "embeddings":
        emb = np.asarray(
            tbl["embedding"].combine_chunks().to_pylist(), dtype=np.float32
        )
        rolled = np.roll(emb, copy, axis=1)
        cols["embedding"] = pa.chunked_array(
            [pa.array(list(rolled), type=tbl.schema.field("embedding").type)]
        )
    return pa.table(cols, schema=tbl.schema)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/heavydata/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    tables = {
        t: pq.read_table(f"{SRC}/{t}.parquet")
        for t in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    }
    strides = _domain_strides(tables)
    print("domain strides:", strides)
    for name, tbl in tables.items():
        if name in ("region", "nation"):
            out = tbl  # fixed-cardinality dims: single copy
        else:
            out = pa.concat_tables(
                [_copy_table(name, tbl, c, strides) for c in range(copies)]
            )
        pq.write_table(out, f"{out_dir}/{name}.parquet")
        print(f"{name}: {tbl.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
