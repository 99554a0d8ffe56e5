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

import os

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
    doc_id = pa.array([f"doc{int(d):012d}" for d in
                       docs["doc_id"].to_pylist()], pa.string())
    tokens = hash_tokenize(docs["text"].to_pylist())
    n_tok = pa.array([len(tokens[i]) for i in range(n)], pa.int32())
    tbl = attrs.set_column(attrs.schema.get_field_index("tokens"),
                           "tokens", tokens)
    for name, col in (("doc_id", doc_id), ("n_tok", n_tok),
                      ("source", docs["source"].combine_chunks())):
        tbl = tbl.set_column(tbl.schema.get_field_index(name), name,
                             col if isinstance(col, pa.Array)
                             else col.combine_chunks())
    return tbl


# --- persisted flagship input for the DuckDB oracle --------------------
# The driver's correctness gate runs each flagship queries() entry AND
# its oracle_sql() over the same data.  The flagship input is derived
# from testdata documents + the seeded synthetic attribute generator —
# not SQL-expressible — so the derived table is persisted once per
# sf_dir at a fixed path that the (static) oracle SQL reads with
# read_parquet().  The file also carries sanitized_query/shape_hash
# computed by the SAME Redactor the Ray pipeline uses, so the oracle
# can consume redaction output while re-deriving classification and
# every aggregate independently in SQL.
def flagship_oracle_path(sf_dir: str) -> str:
    """Per-``sf_dir`` fixture path.  The path must be a pure function
    of the input directory: the driver calls ``entry()`` (sf0.001) and
    the sf0.01 oracle battery in an order this library can't control,
    and a single shared path would let one overwrite the other's
    persisted input between the Ray side and the oracle side."""
    import re

    slug = re.sub(r"[^A-Za-z0-9._-]+", "_",
                  os.path.abspath(sf_dir)).strip("_")
    return f"/tmp/mlp_flagship_events_{slug}.parquet"


# the driver compares Ray vs oracle at sf=0.01 — the static oracle SQL
# strings (oracle_sql.py) read this instance
FLAGSHIP_ORACLE_PATH = flagship_oracle_path("/root/testdata/sf0.01")


def ensure_flagship_parquet(sf_dir: str, seed: int = 42,
                            path: str | None = None) -> str:
    """Idempotently persist the flagship input table (scalar columns +
    driver-side redaction outputs) for ``sf_dir``; returns ``path``
    (default: the per-sf_dir fixture path)."""
    from ..util import fixture_key_matches, write_fixture_atomic

    if path is None:
        path = flagship_oracle_path(sf_dir)
    # bump the version suffix whenever synth/schema output changes —
    # it invalidates the cached oracle parquet.  v4: the tokens list
    # column is included (the token-frequency oracle unnests it)
    key = f"{os.path.abspath(sf_dir)}|seed={seed}|v4"
    if fixture_key_matches(path, key):
        return path
    from ..stages.redact import Redactor

    tbl = events_tok_from_documents(sf_dir, seed=seed)
    tbl = Redactor(enabled=True)(tbl)
    # small row groups so ray.data.read_parquet splits the single file
    # into parallel blocks
    return write_fixture_atomic(path, tbl, key, compression="zstd",
                                row_group_size=16384)
