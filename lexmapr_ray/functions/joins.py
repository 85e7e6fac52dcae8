"""Join primitives.

Three join strategies, chosen by side size — the same decision a distributed
planner makes:

- :func:`broadcast_semi_join` / :func:`broadcast_map_join`: the small side is
  ``ray.put`` once (one copy per node) and probed inside ``map_batches``.
  No shuffle.  Use for dimension tables, key sets, vocabularies.
- :func:`bucketed_hash_join`: both sides large.  Tag + harmonize schemas +
  bucket by key hash, union, ONE groupby on the bucket id, and a pandas
  merge per bucket.  This is the explicit partitioned hash join; Ray
  2.49's built-in ``Dataset.join`` mishandles empty partitions
  ("No match ... FieldRef" from acero) and over-allocates aggregator actors,
  so we keep the portable formulation.  Skew: pick ``num_buckets`` >> cores
  so one hot key cannot dominate a worker; for pathological single-key skew,
  salt the build side (duplicate its rows per salt) before calling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def broadcast_semi_join(ds, col: str, keys_ref):
    """Keep rows whose *col* value is in the broadcast key set.

    ``keys_ref`` should come from :func:`lexmapr_ray.functions.broadcast.put_keyset`
    (a prebuilt Arrow array, resolved once per worker) — the probe is a single
    ``pc.is_in`` hash-kernel call per batch, no per-row Python.
    """
    from lexmapr_ray.functions.broadcast import is_in

    def _filter(t: pa.Table) -> pa.Table:
        return t.filter(is_in(t[col], keys_ref))

    return ds.map_batches(_filter, batch_format="pyarrow")


def broadcast_map_join(ds, col: str, lookup_ref, new_col: str, drop_misses: bool = True):
    """Attach ``new_col = values[keys.index(col)]`` from a broadcast lookup.

    ``lookup_ref`` comes from :func:`lexmapr_ray.functions.broadcast.put_lookup`
    (two aligned Arrow arrays).  Per batch this is ``pc.index_in`` (vectorized
    hash probe) + ``pc.take`` (gather) — the Arrow-native hash-join probe side.
    """
    from lexmapr_ray.functions.broadcast import lookup

    def _attach(t: pa.Table) -> pa.Table:
        vals = lookup(t[col], lookup_ref)
        t = t.append_column(new_col, vals)
        if drop_misses:
            t = t.filter(pc.is_valid(t[new_col]))
        return t

    return ds.map_batches(_attach, batch_format="pyarrow")


def _stable_bucket(series: pd.Series, num_buckets: int) -> np.ndarray:
    return (pd.util.hash_array(series.to_numpy()) % num_buckets).astype(np.int64)


def bucketed_hash_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    *,
    num_buckets: int = 32,
    how: str = "inner",
):
    """Partitioned hash join of two Datasets (see module docstring).

    Returns a Dataset with left columns then right columns (the right key
    column is dropped when its name differs).
    """
    right_on = right_on or on
    left_schema = left.schema()
    right_schema = right.schema()
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    overlap = (set(left_cols) & set(right_cols)) - ({on} if on == right_on else set())
    if overlap:
        raise ValueError(f"column collision in join: {sorted(overlap)}")

    def _arrow_type(t) -> pa.DataType:
        # a Dataset whose last op emitted pandas blocks reports numpy dtypes
        # / Python classes here; coerce so joins chain (join-of-join)
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()

    left_arrow = pa.schema(
        [pa.field(n, _arrow_type(t)) for n, t in zip(left_schema.names, left_schema.types)]
    )
    right_arrow = pa.schema(
        [pa.field(n, _arrow_type(t)) for n, t in zip(right_schema.names, right_schema.types)]
    )
    union_fields = list(left_arrow) + [
        f for f in right_arrow if f.name not in left_cols
    ]
    union_schema = pa.schema(
        union_fields + [pa.field("__side", pa.int8()), pa.field("__bucket", pa.int64())]
    )

    def _tag(side: int, key_col: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame()
            for f in union_schema:
                if f.name == "__side":
                    out["__side"] = np.int8(side)
                elif f.name == "__bucket":
                    out["__bucket"] = _stable_bucket(df[key_col], num_buckets)
                elif f.name in df.columns:
                    out[f.name] = df[f.name]
                else:
                    out[f.name] = pd.Series([None] * len(df), dtype="object")
            return out

        return fn

    # When key names differ, carry the right key in the left key's column so
    # the union schema stays single-keyed.
    def _tag_right(df: pd.DataFrame) -> pd.DataFrame:
        if right_on != on:
            df = df.rename(columns={right_on: on})
        return _tag(1, on)(df)

    # large batch_size bundles the upstream blocks so the sort shuffle sees
    # tens of blocks, not hundreds (sort cost grows with blocks^2 — the
    # un-bundled q5 join spent 19 s in Sort for 0.5 s of merges)
    tagged_left = left.map_batches(
        _tag(0, on), batch_format="pandas", batch_size=65536
    )
    tagged_right = right.map_batches(
        _tag_right, batch_format="pandas", batch_size=65536
    )
    unioned = tagged_left.union(tagged_right)

    right_value_cols = [c for c in right_cols if c != right_on]
    out_schema = pa.schema(
        list(left_arrow) + [right_arrow.field(c) for c in right_value_cols]
    )

    def _merge_block(g: pd.DataFrame) -> pa.Table:
        l = g[g["__side"] == 0][left_cols]
        r = g[g["__side"] == 1][[on] + right_value_cols]
        m = l.merge(r, on=on, how=how)
        # emit a TYPED Arrow table: the sorted union block hands us object /
        # NaN-promoted columns, and leaving the output as pandas loses the
        # Arrow types downstream (breaking join chaining); from_pandas=True
        # maps NaN -> null so outer joins keep integer columns nullable
        return pa.Table.from_arrays(
            [pa.array(m[f.name], type=f.type, from_pandas=True) for f in out_schema],
            schema=out_schema,
        )

    # sort on the bucket id co-locates every bucket (hence every key) in
    # exactly one block, so one pandas merge per BLOCK is exact — the same
    # sort-co-location argument as lexmapr_ray.pipelines.kg.dedup_triples,
    # and much cheaper than groupby().map_groups
    return unioned.sort("__bucket").map_batches(
        _merge_block, batch_format="pandas", batch_size=None
    )
