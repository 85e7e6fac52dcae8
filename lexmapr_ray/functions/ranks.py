"""Distributed global dense ranking via the block-offset prefix-sum
pattern (factored from ``stages/textstats.py::corpus_shuffle_order``; the
same shape as ``stages/packing.py::sequence_pack``).

Input contract: a Dataset with a STRING column ``k`` whose ascending
lexicographic order is the desired global rank order, unique per row
(embed a zero-padded unique id in the key tail to guarantee it), plus any
payload columns.  Shape:

    sort("k")                      -> range-partitioned, globally ordered
    one stats row per block        -> (min_k, n) to the driver; the driver
                                      holds one row per BLOCK, never per row
    exclusive cumsum -> ray.put    -> block start offsets, broadcast once
    per-block local rank + offset  -> dense 0-based global rank

Exact because sort outputs are never re-split (the pinned guarantee in
``functions/groupagg.py``) and block offsets are a pure prefix sum of the
per-block counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def global_dense_rank(ds, *, rank_col: str = "rank", drop_key: bool = True):
    """Dense 0-based global rank of every row of ``ds`` in ascending order
    of its string key column ``k`` (see module docstring for the
    contract).  Returns the payload columns plus ``rank_col``.

    The keyed input is materialized: the stats pass and the rank pass both
    consume the SORTED dataset, and without pinning it the whole upstream
    (including the sort) would execute twice.
    """
    import ray

    keyed = ds.sort("k").materialize()

    def block_stats(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"min_k": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        return pd.DataFrame({"min_k": [df["k"].min()], "n": [len(df)]})

    stats = keyed.map_batches(block_stats, batch_format="pandas",
                              batch_size=None).to_pandas()
    stats = stats.sort_values("min_k").reset_index(drop=True)
    offsets_ref = ray.put((
        np.array(stats["min_k"].tolist(), dtype=object),
        stats["n"].cumsum().shift(fill_value=0).to_numpy(dtype=np.int64),
    ))

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        payload = [c for c in df.columns if c != "k" or not drop_key]
        if len(df) == 0:
            out = df[payload].copy()
            out[rank_col] = pd.Series([], dtype="int64")
            return out
        min_ks, offs = ray.get(offsets_ref)
        df = df.sort_values("k", kind="mergesort")
        i = int(np.searchsorted(min_ks, df["k"].iloc[0]))
        out = df[payload].reset_index(drop=True)
        out[rank_col] = int(offs[i]) + np.arange(len(df), dtype=np.int64)
        return out

    return keyed.map_batches(rank, batch_format="pandas", batch_size=None)
