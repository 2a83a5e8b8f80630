"""Scratch scaling-sweep data generator (SCALING.md).

Generates schema-compatible copies of the sf0.1 test tables at k× volume
(k = 2, 5, 10 → "sf0.2 / sf0.5 / sf1") so per-family wall-time exponents
can be MEASURED instead of design-graded. Never touches /root/testdata —
output goes to a scratch dir inside the repo (git-ignored).

Two generation modes, chosen per table by what drives each family's cost:

* **Relational tables** (customer/supplier/part/orders/lineitem/events):
  k key-shifted copies of the real sf0.1 rows. Copy-shift preserves every
  join fan-out, basket-size distribution, and value distribution exactly —
  the honest way to grow a relational workload without inventing new
  distributions. Key shifts keep referential integrity per copy
  (o_custkey shifts with c_custkey, l_orderkey with o_orderkey);
  part/supp keys stay shared so per-order basket composition is unchanged.

* **Documents / embeddings**: fresh synthesis with a fixed seed and a
  SF-INDEPENDENT planted duplicate rate (0.5% exact copies, 2% near-dup
  mutations) matching the observed shape of the driver corpus (~30-word
  vocab, ~55 tokens/doc, 5 langs, 20 sources). Copy-shifting text would
  make every doc an exact/near dup of its replicas — pair counts would
  then grow quadratically BY CONSTRUCTION and any measured exponent would
  grade the data, not the algorithm. Embeddings: 10 gaussian clusters in
  64d, float32, cluster id as label — same shape as the driver corpus.

Usage: python tools/gen_scale_data.py <out_dir> <k>
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

CUST_SHIFT = 1_000_000
ORDER_SHIFT = 100_000_000
EVENT_SHIFT = 10_000_000
USER_SHIFT = 1_000_000

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark a "
    "the line sort window order data column join small customer query big "
    "vector group stream filter"
).split()
LANGS = ["en", "de", "es", "zh", "fr"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
N_SOURCES = 20
DOCS_PER_K = 5_000  # documents per 1× (sf0.1-equivalent)
EMB_PER_K = 2_000
EXACT_DUP_RATE = 0.005
NEAR_DUP_RATE = 0.02


def _copy_shift(table: str, out_dir: str, k: int) -> None:
    t = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
    cols = {c: t.column(c).to_numpy(zero_copy_only=False) for c in t.column_names}
    shifts = {
        "customer": {"c_custkey": CUST_SHIFT},
        "orders": {"o_orderkey": ORDER_SHIFT, "o_custkey": CUST_SHIFT},
        "lineitem": {"l_orderkey": ORDER_SHIFT},
        "events": {"event_id": EVENT_SHIFT, "user_id": USER_SHIFT},
        "supplier": {},
        "part": {},
        "region": {},
        "nation": {},
    }[table]
    if table in ("region", "nation"):  # fixed-cardinality dims never scale
        pq.write_table(t, os.path.join(out_dir, f"{table}.parquet"))
        return
    parts = []
    for i in range(k):
        chunk = {}
        for c, arr in cols.items():
            chunk[c] = arr + i * shifts[c] if c in shifts and i else arr
        parts.append(pa.table(chunk, schema=t.schema))
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, f"{table}.parquet"))


def _gen_documents(out_dir: str, k: int, rng: np.random.Generator) -> None:
    n = DOCS_PER_K * k
    lang = rng.choice(LANGS, size=n, p=LANG_P)
    source = np.array([f"src{i}" for i in rng.integers(0, N_SOURCES, size=n)])
    lengths = rng.integers(40, 72, size=n)
    vocab_p = globals().get("_VOCAB_P")  # open-vocab mode: Zipf weights
    texts: list[str] = []
    for i in range(n):
        toks = rng.choice(VOCAB, size=lengths[i], p=vocab_p)
        texts.append(" ".join(toks))
    # plant duplicates at a fixed rate, always pointing at EARLIER docs so
    # density is uniform in corpus position (no boundary artifacts)
    n_exact = int(n * EXACT_DUP_RATE)
    n_near = int(n * NEAR_DUP_RATE)
    victims = rng.integers(n // 10, n, size=n_exact + n_near)
    for j, v in enumerate(victims[:n_exact]):
        texts[v] = texts[rng.integers(0, v)]
    for v in victims[n_exact:]:
        src_doc = texts[rng.integers(0, v)].split()
        for _ in range(3):  # mutate 3 token positions
            src_doc[rng.integers(0, len(src_doc))] = VOCAB[rng.integers(0, len(VOCAB))]
        texts[v] = " ".join(src_doc)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "source": pa.array(source, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))


def _gen_embeddings(out_dir: str, k: int, rng: np.random.Generator) -> None:
    n = EMB_PER_K * k
    centers = rng.normal(0, 1.0, size=(10, 64))
    label = rng.integers(0, 10, size=n)
    vecs = centers[label] + rng.normal(0, 0.35, size=(n, 64))
    flat = pa.array(vecs.astype(np.float32).ravel(), pa.float32())
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(flat, 64).cast(
                pa.list_(pa.float32())
            ),
            "label": pa.array(label.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))


def main() -> None:
    out_dir, k = sys.argv[1], int(sys.argv[2])
    opts = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42 + k)
    if "--open-vocab" in opts:
        # Open-vocabulary corpus: the driver corpus's closed 30-word vocab
        # saturates every possible shingle past any df-cap at ~10× scale
        # (27,000 possible trigrams, all with df ≈ 100 at k=10), which
        # makes inverted-index families measure nothing. A Zipf-ish open
        # vocab keeps the df distribution scale-stable — the realistic
        # shape for web-scale text.
        global VOCAB
        ranks = np.arange(1, 5001)
        weights = 1.0 / ranks
        VOCAB = [f"w{i}" for i in ranks]
        globals()["_VOCAB_P"] = weights / weights.sum()
    if "--docs-only" not in opts:
        for t in ("region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events"):
            _copy_shift(t, out_dir, k)
        _gen_embeddings(out_dir, k, rng)
    _gen_documents(out_dir, k, rng)
    print(f"wrote {out_dir} at k={k} {' '.join(opts)}")


if __name__ == "__main__":
    main()
