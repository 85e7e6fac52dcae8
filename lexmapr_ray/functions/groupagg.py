"""Distributed grouped aggregation via sort co-location.

Measured on this Ray build (2.49), both built-in grouped operators are
dominated by per-group / per-block machinery rather than the actual
reduction: ``groupby().map_groups`` pays one Python+pandas call per group
(~1 ms x cardinality), and ``groupby().aggregate`` pays AggregateFn row
accounting that hit 28 s for a single 76k-row block in the q5 join.  The
engine therefore standardizes on ONE shape for every grouped reduction:

    partial per-batch pandas combine  (bundled large batches — also
        coalesces block count ahead of the shuffle, blocks^2 sort cost)
    -> Dataset.sort(keys)             (equal keys provably co-partitioned:
        boundary assignment is a pure function of the key)
    -> per-block vectorized pandas final combine  (batch_size=None so
        batches never split a sorted block)

``grouped_sum_count`` covers the Sum/Count family (every SQL-oracled query
in this repo); pass ``partial_fn``/``final_fn`` to :func:`sorted_group_reduce`
for custom reductions (argmax, pair generation, ...).

Why the co-location invariant is safe under dynamic block splitting
(advisor r2 raised it): Ray 2.49's sort reduce task merges its range's
mapper slices with ``BlockAccessor.merge_sorted_blocks`` and returns ONE
block per range partition (ray/data/_internal/planner/exchange/
sort_task_spec.py:148-161) — sort outputs are never re-split at
``target_max_block_size``, so with ``batch_size=None`` a post-sort
``map_batches`` always sees each range (hence each key group) whole.  The
cost of a pathologically hot key is one oversized block's worth of MEMORY
in its reduce/consumer task, never a silently split group.
``tests/test_stages.py::test_sorted_reduce_survives_tiny_block_target``
pins the behavior: if a Ray upgrade ever starts splitting sort outputs,
that test fails loudly instead of queries silently double-counting.
"""

from __future__ import annotations

import pandas as pd

DEFAULT_BUNDLE = 65536


def sorted_group_reduce(ds, keys, partial_fn, final_fn, *, bundle: int = DEFAULT_BUNDLE):
    """General two-phase grouped reduction (see module docstring).

    ``partial_fn``/``final_fn`` are pandas DataFrame -> DataFrame; both must
    be per-key associative (partial output rows for one key are merged by
    final_fn exactly once, in one block).
    """
    partial = ds.map_batches(partial_fn, batch_format="pandas", batch_size=bundle)
    return partial.sort(keys).map_batches(
        final_fn, batch_format="pandas", batch_size=None
    )


def grouped_sum_count(
    ds,
    keys: list[str] | str,
    sum_cols: dict[str, str] | None = None,
    count_alias: str | None = None,
    *,
    bundle: int = DEFAULT_BUNDLE,
):
    """groupby(keys) with integer/float Sum(col)->alias and optional Count.

    Output columns: keys + sum aliases (+ count alias), globally sorted by
    *keys* (range-partitioned blocks, sorted within).
    """
    import pyarrow as pa

    keys = [keys] if isinstance(keys, str) else list(keys)
    sum_cols = sum_cols or {}
    count_col = count_alias or "__n"

    # Arrow-native hash aggregation on both sides (C++ kernels, zero pandas
    # boxing — the combiner sits right behind hot per-batch stages).
    # use_threads=False: each task owns one CPU token.  Integer sums widen
    # to int64 (matching the engine's integer-exact convention); the final
    # re-sorts its block so the output keeps the global key order the sort
    # established (Arrow group_by emits hash order).
    src_cols = list(dict.fromkeys(sum_cols.values()))

    def partial(t: pa.Table) -> pa.Table:
        out = t.group_by(keys, use_threads=False).aggregate(
            [(c, "sum") for c in src_cols] + [([], "count_all")])
        cols = {k: out[k] for k in keys}
        for alias, col in sum_cols.items():
            cols[alias] = out[f"{col}_sum"]
        cols[count_col] = out["count_all"]
        return pa.table(cols)

    def final(t: pa.Table) -> pa.Table:
        out = t.group_by(keys, use_threads=False).aggregate(
            [(alias, "sum") for alias in sum_cols] + [(count_col, "sum")])
        cols = {k: out[k] for k in keys}
        for alias in sum_cols:
            cols[alias] = out[f"{alias}_sum"]
        if count_alias is not None:
            cols[count_col] = out[f"{count_col}_sum"]
        return pa.table(cols).sort_by([(k, "ascending") for k in keys])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=bundle)
    return partials.sort(keys).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )
