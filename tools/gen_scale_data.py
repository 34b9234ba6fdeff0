"""One-off seeded generator for the 10x scale probe (SCALE.md).

Synthesizes events/documents/embeddings at a multiple of the sf0.1 driver
data, matching the driver's measured distributions (TESTDATA.md data is
read-only and tops out at sf0.1):

- events: 1M rows at x10 — users scale with sf (the driver does: 150 at
  sf0.01 -> 1500 at sf0.1, keeping ~66 events/user), 5 event types uniform,
  value ~ Exp(50), props {"k": 0..99}, ts uniform over the same 30-day
  January 2024 window, written as TIMESTAMP(NANOS) like the driver's files.
- documents: 50k rows at x10 — 10..100 words uniform from the driver's
  31-word vocabulary (measured), lang x source strata preserved.  NOTE:
  a fixed tiny vocabulary makes shingle document-frequencies scale linearly
  with N, the densest case for similarity joins — candidate counts are
  expected superlinear HERE BY CONSTRUCTION (real corpora are Zipfian);
  the probe measures whether wall time tracks the candidate count, which is
  the actual design claim.
- embeddings: 20k rows at x10 — unit-normalized 64-dim Gaussian directions,
  labels uniform 0..9 (the driver's vectors measure as uniform on the
  sphere: per-label centroid norms ~0.07).

Usage: python tools/gen_scale_data.py --mult 10 --out /tmp/sg_scale/sf1
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "query", "batch", "group", "filter", "sort", "scan", "hash",
    "agg", "row", "key", "part", "line", "order", "small", "big", "fast",
    "slow", "index", "join", "shard", "block", "a", "the",
]
LANGS = ["de", "en", "es", "fr", "ja"]
SOURCES = [f"src{i}" for i in range(20)]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
T0_NS = int(np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64))
SPAN_NS = 30 * 24 * 3600 * 10**9


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pa.Table:
    ts = np.sort(T0_NS + rng.integers(0, SPAN_NS, n))
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("ns")),
            "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
            "event_type": pa.array(rng.choice(EVENT_TYPES, n)),
            "value": pa.array(np.round(rng.exponential(50.0, n), 2)),
            "props": pa.array([json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n)]),
        }
    )


def gen_documents(
    rng: np.random.Generator, n: int, dup_frac: float = 0.002, vocab: str = "fixed"
) -> pa.Table:
    """``vocab='fixed'`` reproduces the driver's 31-word corpus (the dense
    worst case: every shingle's df scales with N).  ``vocab='zipf'`` draws
    words from a Zipf(1.3) rank distribution over a Heaps-law vocabulary
    (V ∝ N^0.7, ≥2000 types) — the realistic heavy-tailed df profile the
    AllPairs prefix filter exploits: the frequent head carries tiny idf
    weight (suffix territory), the long rare tail drives candidates."""
    if vocab == "zipf":
        v_size = max(2000, int(2000 * (n / 5000.0) ** 0.7))

        def draw(k: int) -> str:
            ranks = np.minimum(rng.zipf(1.3, k), v_size)
            return " ".join(f"w{int(r)}" for r in ranks)

    else:

        def draw(k: int) -> str:
            return " ".join(rng.choice(VOCAB, k))

    texts = []
    for i in range(n):
        if texts and rng.random() < dup_frac:
            texts.append(texts[rng.integers(0, len(texts))])  # exact dups, like the driver
            continue
        k = int(rng.integers(10, 101))
        texts.append(draw(k))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(rng.choice(LANGS, n)),
            "source": pa.array(rng.choice(SOURCES, n)),
            "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int, dim: int = 64) -> pa.Table:
    v = rng.standard_normal((n, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n), pa.int32()),
        }
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=float, default=10.0, help="multiple of sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--vocab", choices=["fixed", "zipf"], default="fixed")
    ap.add_argument(
        "--docs-only", action="store_true", help="write documents.parquet only"
    )
    args = ap.parse_args()
    # Independent child generator per table (SeedSequence spawn): each
    # table's random stream depends only on (seed, its fixed child index),
    # so adding/removing tables or reordering the generator calls (e.g.
    # --docs-only) can never perturb another table's data — probe datasets
    # at the same --mult/--seed stay byte-identical across tool revisions.
    ev_rng, doc_rng, emb_rng = (
        np.random.default_rng(s) for s in np.random.SeedSequence(args.seed).spawn(3)
    )
    os.makedirs(args.out, exist_ok=True)
    n_ev = int(100_000 * args.mult)
    n_users = int(1500 * args.mult)
    n_docs = int(5_000 * args.mult)
    n_emb = int(2_000 * args.mult)
    pq.write_table(
        gen_documents(doc_rng, n_docs, vocab=args.vocab),
        os.path.join(args.out, "documents.parquet"),
    )
    if not args.docs_only:
        pq.write_table(gen_events(ev_rng, n_ev, n_users), os.path.join(args.out, "events.parquet"))
        pq.write_table(gen_embeddings(emb_rng, n_emb), os.path.join(args.out, "embeddings.parquet"))
    print(json.dumps({"out": args.out, "events": None if args.docs_only else n_ev, "users": n_users, "documents": n_docs, "embeddings": None if args.docs_only else n_emb, "vocab": args.vocab}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
