#!/usr/bin/env python3
"""Dev tool: generate an sf1 slice of documents/embeddings (10x sf0.1) for
the SF-scaling smoke in BASELINE.md. The driver's testdata tops out at
sf0.1; this bootstraps a 10x corpus from sf0.1's own empirical
distributions (token unigram frequencies, per-doc token counts, lang/source
mix, exact-dup and near-dup injection rates, per-label embedding
centroid/std) so the scaling measurement stresses the same shapes, just
bigger. Deterministic (seed 42). Writes /tmp/sf1/{documents,embeddings}
.parquet and symlinks the sf0.1 TPC-H/events tables alongside so Bench's
table warmup resolves.

NOT part of the library - local measurement tooling only (python/duckdb
are driver-side-only dependencies, same as tools/check.py).
"""
import collections
import os
import random
import statistics

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
# Defaults build the sf1 smoke slice; the r20 two-decade scaling table
# reuses the same resampler for sf10 via:
#   GRAFT_GEN_SCALE=100 GRAFT_GEN_OUT=/tmp/sf10 GRAFT_GEN_DOCS_ONLY=1
# DOCS_ONLY symlinks the fact tables instead of replicating them — the
# doc/embedding families under measurement never read them, and a 100x
# lineitem is ~1 GB of parquet the smoke would pay for nothing.
OUT = os.environ.get("GRAFT_GEN_OUT", "/tmp/sf1")
SCALE = int(os.environ.get("GRAFT_GEN_SCALE", "10"))
DOCS_ONLY = os.environ.get("GRAFT_GEN_DOCS_ONLY", "") == "1"
SEED = 42

con = duckdb.connect()
rng = random.Random(SEED)
nprng = np.random.default_rng(SEED)

# ---- documents ----------------------------------------------------------
rows = con.execute(
    f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet' ORDER BY doc_id"
).fetchall()
n_src_docs = len(rows)

tok_freq = collections.Counter()
doc_lens = []
lang_freq = collections.Counter()
for _, text, lang, _ in rows:
    toks = text.split(" ")
    tok_freq.update(toks)
    doc_lens.append(len(toks))
    lang_freq[lang] += 1

vocab = sorted(tok_freq)
weights = [tok_freq[t] for t in vocab]
# random.choices re-accumulates `weights` on every call (O(|vocab|) per
# doc — fine at 50k docs, hours at 500k); precompute the cumulative form
import itertools

cum_weights = list(itertools.accumulate(weights))
langs = sorted(lang_freq)
lang_w = [lang_freq[l] for l in langs]
sources = sorted({r[3] for r in rows})

# dup structure of the source corpus: docs sharing a normalized text
norm_groups = collections.Counter(" ".join(t[1].split()) for t in rows)
exact_dup_docs = sum(c - 1 for c in norm_groups.values() if c > 1)
p_exact = exact_dup_docs / n_src_docs  # extra exact copies per doc
p_near = 0.01  # mutated copies (the near-dup family finds tens of pairs per 5k docs)

n_docs = n_src_docs * SCALE
texts = []
doc_rows = []
for i in range(n_docs):
    u = rng.random()
    if texts and u < p_exact:
        text = rng.choice(texts)
    elif texts and u < p_exact + p_near:
        toks = rng.choice(texts).split(" ")
        for _ in range(2):  # mutate 2 tokens -> high-Jaccard near-dup
            toks[rng.randrange(len(toks))] = rng.choices(vocab, cum_weights=cum_weights)[0]
        text = " ".join(toks)
    else:
        n = rng.choice(doc_lens)
        text = " ".join(rng.choices(vocab, cum_weights=cum_weights, k=n))
    texts.append(text)
    doc_rows.append(
        (i, text, rng.choices(langs, lang_w)[0], f"src{i % len(sources)}", len(text))
    )

os.makedirs(OUT, exist_ok=True)
pq.write_table(
    pa.table(
        {
            "doc_id": pa.array([r[0] for r in doc_rows], pa.int64()),
            "text": pa.array([r[1] for r in doc_rows]),
            "lang": pa.array([r[2] for r in doc_rows]),
            "source": pa.array([r[3] for r in doc_rows]),
            "n_chars": pa.array([r[4] for r in doc_rows], pa.int64()),
        }
    ),
    f"{OUT}/documents.parquet",
)

# ---- embeddings ---------------------------------------------------------
emb = con.execute(
    f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' ORDER BY vec_id"
).fetchall()
by_label = collections.defaultdict(list)
for _, v, label in emb:
    by_label[label].append(np.asarray(v, dtype=np.float32))
stats = {
    lb: (np.mean(vs, axis=0), np.std(vs, axis=0) + 1e-6)
    for lb, vs in by_label.items()
}
labels_sorted = sorted(stats)
n_vecs = len(emb) * SCALE
vecs, labels = [], []
for i in range(n_vecs):
    lb = labels_sorted[i % len(labels_sorted)]
    mu, sd = stats[lb]
    vecs.append((mu + nprng.standard_normal(mu.shape).astype(np.float32) * sd).tolist())
    labels.append(lb)
pq.write_table(
    pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    ),
    f"{OUT}/embeddings.parquet",
)

# ---- facts: orders/lineitem/events at 10x (round 8) ---------------------
# Replication with key shifting, not resampling: copy k shifts every
# order key by k*ORDER_SPAN (and the lineitem side identically), so
# referential integrity holds exactly and every per-key distribution is
# preserved — each customer simply owns 10x orders, which is how TPC-H
# facts grow against slower-growing dims. Events additionally shift ts by
# k*(span + 1h) so the timeline EXTENDS (constant per-window density, 10x
# windows/sessions per user) instead of densifying one month 10x.
# pyarrow, not duckdb COPY: the physical column types must survive
# byte-for-byte (orders/lineitem timestamp[ms]; events timestamp[ns],
# which the engine reads as raw int64 nanos).


def _replicate(table, shift):
    src = pq.read_table(f"{SRC}/{table}.parquet")
    src = src.replace_schema_metadata(None)
    copies = [shift(src, k) for k in range(SCALE)]
    dst = f"{OUT}/{table}.parquet"
    if os.path.islink(dst):  # earlier rounds symlinked the sf0.1 table
        os.unlink(dst)
    pq.write_table(pa.concat_tables(copies), dst)


def _shift_col(tbl, name, delta):
    i = tbl.schema.get_field_index(name)
    col = tbl.column(name)
    typ = col.type
    shifted = pc.add(col.cast(pa.int64()), delta).cast(typ)
    return tbl.set_column(i, tbl.schema.field(i), shifted)


if DOCS_ONLY:
    facts_note = "facts symlinked at sf0.1 (DOCS_ONLY)"
    for t in ["orders", "lineitem", "events"]:
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
else:
    ORDER_SPAN = 1 + con.execute(
        f"SELECT max(o_orderkey) FROM '{SRC}/orders.parquet'"
    ).fetchone()[0]
    _replicate("orders", lambda t, k: _shift_col(t, "o_orderkey", k * ORDER_SPAN))
    _replicate("lineitem", lambda t, k: _shift_col(t, "l_orderkey", k * ORDER_SPAN))

    EVENT_SPAN = 1 + con.execute(
        f"SELECT max(event_id) FROM '{SRC}/events.parquet'"
    ).fetchone()[0]
    ts_lo, ts_hi = con.execute(
        f"SELECT min(ts), max(ts) FROM '{SRC}/events.parquet'"
    ).fetchone()
    TS_STEP_NS = int((ts_hi - ts_lo).total_seconds() * 1e9) + 3_600_000_000_000
    _replicate(
        "events",
        lambda t, k: _shift_col(
            _shift_col(t, "event_id", k * EVENT_SPAN), "ts", k * TS_STEP_NS
        ),
    )
    facts_note = f"facts {SCALE}x: orders/lineitem (key shift {ORDER_SPAN}), events (ts step {TS_STEP_NS} ns)"

# ---- the dimension tables stay at sf0.1 ---------------------------------
for t in ["region", "nation", "customer", "supplier", "part"]:
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)

print(
    f"{OUT}: {n_docs} docs (p_exact={p_exact:.4f}, p_near={p_near}), "
    f"{n_vecs} vecs, mean_len={statistics.mean(doc_lens):.1f}, {facts_note}"
)
