"""Exact distributed grouped quantiles via a bounded-cardinality histogram.

At 100 TB the naive plan (global sort per key, then pick ranks) shuffles the
whole corpus to read out four numbers per key.  For integer-valued metrics
(document lengths, money cents, token counts) the value DOMAIN is bounded
even when the corpus is not, so the engine histograms first:

    per-batch (key, value) count combine              # map-side shrink
    -> grouped_sum_count((key, value))                # ONE small shuffle:
                                                      #   |keys| x |values| rows
    -> sort(key) -> per-block cumulative rank walk    # histogram-sized

The post-histogram data is |keys| x |distinct values| rows regardless of
corpus size (a 100 TB corpus of documents still has < a few million distinct
lengths), so the final walk never sees corpus-scale data.  For genuinely
continuous/unbounded domains, bucket the value first (the caller chooses the
resolution) — same trade t-digest makes, but deterministic.

Quantile semantics match DuckDB's ``quantile_disc`` EXACTLY: the value at
1-based rank ceil(q*n) of the sorted multiset, with the rank computed in
integer arithmetic (q passed as num/den, never a float — float ceil(q*n)
can land one rank high when q*n rounds up to an integer).  Verified equal
to DuckDB for every n in 2..200 plus 500/1000/4000/9549/60000 at each q
used in this repo.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# (output column, q numerator, q denominator)
DEFAULT_QS = (("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p95", 19, 20))


def grouped_exact_quantiles(ds, key: str, value_col: str, qs=DEFAULT_QS):
    """Exact per-*key* quantiles of integer column *value_col*.

    Output: one row per key — (key, p25, p50, p75, p95) int64, sorted by
    key.  The rank walk loops over keys in Python: by the time it runs the
    data is one histogram row per (key, value), and the loop count is the
    number of DISTINCT KEYS in the block (languages, event types, ...),
    not rows.
    """
    from lexmapr_ray.functions.groupagg import grouped_sum_count

    hist = grouped_sum_count(ds, [key, value_col], count_alias="__n")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: pd.Series([], dtype=df[key].dtype if len(df) else "object")}
        cols.update({name: pd.Series([], dtype="int64") for name, _, _ in qs})
        if len(df) == 0:
            return pd.DataFrame(cols)
        df = df.sort_values([key, value_col], kind="mergesort")
        out = {key: [], **{name: [] for name, _, _ in qs}}
        for k, g in df.groupby(key, sort=True):
            vals = g[value_col].to_numpy()
            cum = g["__n"].to_numpy().cumsum()
            n = int(cum[-1])
            out[key].append(k)
            for name, num, den in qs:
                rank = -(-num * n // den)  # ceil(q*n), exact integer math
                out[name].append(int(vals[np.searchsorted(cum, rank, side="left")]))
        res = pd.DataFrame(out)
        for name, _, _ in qs:
            res[name] = res[name].astype("int64")
        return res

    # second sort is over the tiny histogram; post-sort each key's rows are
    # provably whole in one block (functions/groupagg.py invariant)
    return hist.sort(key).map_batches(finalize, batch_format="pandas", batch_size=None)
