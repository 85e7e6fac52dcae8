"""Sequence packing: assign documents to fixed token-budget training
sequences via a distributed prefix sum.

The packing rule is the deterministic contiguous one (the order-preserving
variant of the packing used when assembling LM training batches): documents
are laid end-to-end in ``doc_id`` order and ``seq_id = floor(start_offset /
budget)`` where ``start_offset`` is the total token count of all preceding
documents.  Content-independent of engine/partitioning, so DuckDB's window
``SUM() OVER (ORDER BY doc_id)`` is an exact oracle.

Shape (the distributed prefix-sum pattern):

    narrow map (doc_id, n_tokens)            text dropped before any shuffle
      -> sort(doc_id)                        range partition, disjoint blocks
      -> materialize (narrow table)
      -> pass 1: per-block (min_doc_id, total_tokens)   tiny, one row/block
      -> driver: order block stats by min_doc_id, exclusive cumsum
      -> pass 2: per-block local cumsum + the block's broadcast offset

Scale: the only driver-side state is ONE ROW PER BLOCK (a 100 TB corpus at
128 MiB blocks is ~800k rows of two int64s — megabytes), and the
materialized intermediate is 16 bytes/doc.  The prefix sum is exact because
post-sort blocks partition the doc_id range disjointly and sort reduce
outputs are never re-split (pinned in functions/groupagg.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from lexmapr_ray.stages.textstats import _read_documents, _token_counts


def sequence_pack(sf_dir: str, budget: int = 512):
    """(doc_id, n_tokens, seq_id) for every document; ``seq_id`` groups
    consecutive docs into sequences of ~``budget`` tokens (a doc belongs to
    the sequence its first token lands in; oversized docs spill forward)."""

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(_token_counts(t["text"]), pa.int64()),
        })

    ds = _read_documents(sf_dir, ["doc_id", "text"]) \
        .map_batches(narrow, batch_format="pyarrow") \
        .sort("doc_id").materialize()

    def block_stats(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"min_doc": pd.Series([], dtype="int64"),
                                 "total": pd.Series([], dtype="int64")})
        return pd.DataFrame({"min_doc": [int(df["doc_id"].min())],
                             "total": [int(df["n_tokens"].sum())]})

    import ray

    stats = ds.map_batches(block_stats, batch_format="pandas",
                           batch_size=None).to_pandas()
    stats = stats.sort_values("min_doc").reset_index(drop=True)
    # broadcast the offset table as two aligned arrays (ray.put once, one
    # copy per node) — a closure-captured dict would re-ship with every
    # task spec, ~MBs x num_blocks of control traffic at 100 TB block counts
    offsets_ref = ray.put((
        stats["min_doc"].to_numpy(dtype=np.int64),
        stats["total"].cumsum().shift(fill_value=0).to_numpy(dtype=np.int64),
    ))

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_tokens": pd.Series([], dtype="int64"),
                                 "seq_id": pd.Series([], dtype="int64")})
        min_docs, offs = ray.get(offsets_ref)
        df = df.sort_values("doc_id", kind="mergesort")
        i = int(np.searchsorted(min_docs, int(df["doc_id"].iloc[0])))
        start = int(offs[i]) + df["n_tokens"].cumsum().shift(fill_value=0)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64").to_numpy(),
            "n_tokens": df["n_tokens"].astype("int64").to_numpy(),
            "seq_id": (start.to_numpy() // budget).astype("int64"),
        })

    return ds.map_batches(pack, batch_format="pandas", batch_size=None)
