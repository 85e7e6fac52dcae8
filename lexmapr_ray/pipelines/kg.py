"""End-to-end knowledge-graph construction pipeline (the flagship).

    read_parquet(pages) / synth pages
      -> map_batches(extract_text_stage)                 stateless tasks
      -> map_batches(MentionMatcher, concurrency=N)      actor pool, lexicon broadcast
      -> [canonicalize]  per-batch combiner -> groupby   (shuffle #1, pre-aggregated)
      -> [materialize]   per-batch dedup -> groupby dedup -> sort  (shuffle #2)
      -> write_parquet(out/part=k/) + lineage sidecars   resumable

Scale notes (10^12-document design):
 - The matcher stage is embarrassingly parallel; the lexicon (~4 MB pickled)
   is ``ray.put`` once and mapped zero-copy per node.
 - Canonicalization pre-aggregates (mention, obj) counts INSIDE each batch
   before the shuffle, so the exchanged volume is bounded by per-batch
   surface-form vocabulary, not corpus size — this is the skew guard for hot
   entities ("chicken breast" appearing in 25% of pages shrinks to one row
   per batch).  The final groupby key cardinality is the vocabulary size.
 - Triple dedup likewise drops within-batch duplicates before the groupby.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from lexmapr_ray.stages.match import MentionMatcher, extract_text_stage


def broadcast_lexicon(lexicon=None):
    """``ray.put`` the lexicon once; reuse the handle across stages/runs."""
    import ray

    from lexmapr_ray.lexkit.lexicon import build_lexicon

    if lexicon is None:
        lexicon = build_lexicon()
    return ray.put(lexicon)


def extract_triples(
    pages_ds,
    lexicon_ref=None,
    *,
    bucket: bool = False,
    langs: tuple = ("en",),
    concurrency=None,
    batch_size: int = 256,
):
    """pages Dataset -> triples Dataset (extraction + matcher actor pool)."""
    if lexicon_ref is None:
        lexicon_ref = broadcast_lexicon()
    if concurrency is None:
        import ray

        # leave headroom for the read/extract/shuffle stages
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    ds = pages_ds.map_batches(extract_text_stage, batch_format="pyarrow")
    return ds.map_batches(
        MentionMatcher,
        fn_constructor_kwargs={"lexicon": lexicon_ref, "bucket": bucket, "langs": langs},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def _partial_mention_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: collapse triples to (mention, obj, obj_label, n)."""
    df = batch.select(["mention", "obj", "obj_label"]).to_pandas()
    out = (
        df.groupby(["mention", "obj", "obj_label"], sort=False)
        .size()
        .reset_index(name="n")
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def _pick_canonical(group: pd.DataFrame) -> pd.DataFrame:
    """Per-mention reducer: canonical obj = highest count, ties -> lexicographic."""
    total = int(group["n"].sum())
    g = group.sort_values(["n", "obj"], ascending=[False, True])
    top = g.iloc[0]
    return pd.DataFrame(
        {
            "mention": [top["mention"]],
            "canonical_obj": [top["obj"]],
            "canonical_label": [top["obj_label"]],
            "n_mentions": [total],
            "n_distinct_obj": [group["obj"].nunique()],
        }
    )


def canonicalize_mentions(triples_ds):
    """Entity canonicalization: normalized surface form -> canonical term.

    Two-phase aggregate: per-batch combiner, then Sum over the small partials,
    then a per-key reduce.  See module docstring for the skew rationale.
    """
    from ray.data.aggregate import Sum

    partials = triples_ds.map_batches(_partial_mention_counts, batch_format="pyarrow")
    summed = partials.groupby(["mention", "obj", "obj_label"]).aggregate(Sum("n", alias_name="n"))
    return summed.groupby("mention").map_groups(_pick_canonical, batch_format="pandas")


def _local_dedup(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    df = df.drop_duplicates(subset=["subj", "pred", "obj"], keep="first")
    return pa.Table.from_pandas(df, preserve_index=False)


def dedup_triples(triples_ds):
    """Exact (subj, pred, obj) dedup: local combiner then grouped first-row."""
    ds = triples_ds.map_batches(_local_dedup, batch_format="pyarrow")
    return ds.groupby(["subj", "pred", "obj"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def materialize_graph(triples_ds, out_dir: str | None = None):
    """Sorted, deduplicated graph; written to Parquet when *out_dir* given."""
    ds = dedup_triples(triples_ds).sort(["subj", "pred", "obj"])
    if out_dir:
        ds = ds.materialize()
        ds.write_parquet(out_dir)
    return ds


def run_kg_pipeline(
    pages_ds,
    *,
    lexicon_ref=None,
    out_dir: str | None = None,
    bucket: bool = False,
    concurrency=None,
    batch_size: int = 256,
):
    """Full pipeline; returns the deduped+sorted triples Dataset."""
    triples = extract_triples(
        pages_ds, lexicon_ref, bucket=bucket, concurrency=concurrency, batch_size=batch_size
    )
    return materialize_graph(triples, out_dir)
