"""Derive the flagship input (tokenized log-event table per the
input_hint shape) from the driver-provided testdata.

``documents.parquet`` supplies real (doc_id, text, source) rows; the
text is tokenized with a deterministic hash vocabulary and the
log-attribute columns are taken from the seeded synthetic generator
(pure function of row index — ``synth.generate_chunk``), so the
flagship parse/route/aggregate semantics run over testdata-derived
tokens with fully reproducible attributes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .. import synth
from ..schema import VOCAB_SIZE


def hash_tokenize(texts: list[str]) -> pa.ListArray:
    """Deterministic whitespace tokenizer → int32 ids via FNV-1a."""
    offsets = [0]
    flat: list[int] = []
    for t in texts:
        for w in (t or "").split():
            h = np.uint64(14695981039346656037)
            for b in w.encode():
                h = np.uint64((int(h) ^ b) * 1099511628211 % (1 << 64))
            flat.append(int(h) % VOCAB_SIZE)
        offsets.append(len(flat))
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                    pa.array(flat, pa.int32()))


def events_tok_from_documents(sf_dir: str, seed: int = 42) -> pa.Table:
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    docs = docs.sort_by("doc_id")
    n = docs.num_rows
    attrs = synth.generate_events_tok(n, seed=seed, tok_mean=4)
    tokens = hash_tokenize(docs["text"].to_pylist())
    n_tok = pa.array([len(tokens[i]) for i in range(n)], pa.int32())
    doc_id = pa.array([f"doc{int(d):012d}" for d in
                       docs["doc_id"].to_pylist()], pa.string())
    tbl = attrs
    for name, col in (("doc_id", doc_id), ("tokens", tokens),
                      ("n_tok", n_tok),
                      ("source", docs["source"].combine_chunks())):
        tbl = tbl.set_column(tbl.schema.get_field_index(name), name, col)
    return tbl
