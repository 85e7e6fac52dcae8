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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lexmapr_ray.stages.match import MentionMatcher, extract_text_stage


def broadcast_lexicon(lexicon=None, *, config: str | None = None, resolve=None):
    """``ray.put`` the lexicon once; reuse the handle across stages/runs.

    ``config`` is an ontology config JSON (reference ``--config`` surface,
    pipeline.py:45-54): the fetched ontology lookup table is merged into the
    predefined lexicon, ontology table winning conflicts, before broadcast.
    """
    import ray

    from lexmapr_ray.lexkit.lexicon import build_lexicon, merge_config_into_lexicon

    if lexicon is None:
        lexicon = build_lexicon()
    if config:
        lexicon = merge_config_into_lexicon(lexicon, config, resolve=resolve)
    return ray.put(lexicon)


def extract_triples(
    pages_ds,
    lexicon_ref=None,
    *,
    bucket: bool = False,
    langs: tuple = ("en",),
    concurrency=None,
    batch_size: int = 256,
    actor_num_cpus: float = 1,
    pre_extracted: bool = False,
):
    """pages Dataset -> triples Dataset (extraction + matcher actor pool).

    ``pre_extracted=True`` skips the html->text invariant stage for inputs
    that already carry plain (url, text, lang) rows — e.g. anchor-text
    mentions parsed out of the html by their own extraction stage."""
    if lexicon_ref is None:
        lexicon_ref = broadcast_lexicon()
    if concurrency is None:
        import ray

        # 7/8 of CPUs: the pipeline is matcher-bound (matcher CPU / pool
        # size predicts wall), so actors deserve nearly the whole node and
        # push-based shuffle overlaps the sort in the spare 1/8.  r3
        # sweeps: pool 28 > 20 at 32 CPUs, pool 7 > 5 at 8 CPUs; the r2
        # "5/8" optimum was an artifact of the since-replaced
        # simple-shuffle sort's fat combiner tasks.  The DEFAULT is the
        # autoscaling pool (2, cap): launching a full fixed pool against a
        # small input (a 5k-doc gate query = ~10 blocks) intermittently
        # straggles 6-20 s on unneeded actor spawns (see
        # stages/dedup.py::_auto_concurrency); production-scale callers
        # (bench.py, run shards) pass an explicit int for the fixed-size
        # pool whose one-time spin-up amortizes over thousands of blocks.
        cap = max(2, (int(ray.cluster_resources().get("CPU", 4)) * 7) // 8)
        concurrency = (2, cap)
    ds = pages_ds if pre_extracted else pages_ds.map_batches(
        extract_text_stage, batch_format="pyarrow")
    return ds.map_batches(
        MentionMatcher,
        # the ref is wrapped in a list so Ray ships the tiny handle instead of
        # registering the blob as a restart-fragile constructor dependency
        # (core_worker warns otherwise); each actor ray.get()s it once.
        fn_constructor_kwargs={"lexicon": [lexicon_ref], "bucket": bucket, "langs": langs},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=actor_num_cpus,
    )


def decode_triples(triples_ds):
    """Cast dictionary-encoded triple columns back to plain strings.

    The matcher emits dictionary-encoded columns (object-store compression);
    pipelines that hand raw triples to external consumers decode at the
    boundary so downstream comparators see plain string semantics."""
    def dec(t: pa.Table) -> pa.Table:
        return pa.table({c: pc.cast(t[c], pa.string()) for c in t.column_names})

    return triples_ds.map_batches(dec, batch_format="pyarrow")


def _partial_mention_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: collapse triples to (mention, obj, obj_label, n).

    Arrow-native ``Table.group_by`` (C++ hash aggregation, zero pandas
    boxing; dictionary keys decode to plain strings in the output).
    ``use_threads=False``: the task owns one CPU token — Arrow's internal
    thread pool would oversubscribe it."""
    sel = batch.select(["mention", "obj", "obj_label"])
    sel = pa.table({c: pc.cast(sel[c], pa.string()) for c in sel.column_names})
    out = sel.group_by(["mention", "obj", "obj_label"],
                       use_threads=False).aggregate([([], "count_all")])
    return out.rename_columns(["mention", "obj", "obj_label", "n"])


def _reduce_canonical_block(df):
    """Per-block reduce after the mention-sorted shuffle: sum the partial
    counts, then take the per-mention argmax (count desc, obj asc) — all
    vectorized pandas, zero per-group Python calls."""
    import pandas as pd

    if len(df) == 0:
        return pd.DataFrame(
            {
                "mention": pd.Series([], dtype="object"),
                "canonical_obj": pd.Series([], dtype="object"),
                "canonical_label": pd.Series([], dtype="object"),
                "n_mentions": pd.Series([], dtype="int64"),
                "n_distinct_obj": pd.Series([], dtype="int64"),
            }
        )
    summed = (
        df.groupby(["mention", "obj", "obj_label"], sort=False)["n"]
        .sum()
        .reset_index()
    )
    summed = summed.sort_values(
        ["mention", "n", "obj"], ascending=[True, False, True], kind="mergesort"
    )
    totals = summed.groupby("mention", sort=False)["n"].agg(["sum", "size"])
    top = summed.drop_duplicates("mention", keep="first").set_index("mention")
    out = top.join(totals)
    out = out.reset_index().rename(
        columns={
            "obj": "canonical_obj",
            "obj_label": "canonical_label",
            "sum": "n_mentions",
            "size": "n_distinct_obj",
        }
    )[["mention", "canonical_obj", "canonical_label", "n_mentions", "n_distinct_obj"]]
    out["n_mentions"] = out["n_mentions"].astype("int64")
    out["n_distinct_obj"] = out["n_distinct_obj"].astype("int64")
    return out


def _sum_partial_counts(t: pa.Table) -> pa.Table:
    """Re-combine bundled partial (mention, obj, obj_label, n) rows —
    associative, so any number of applications before the shuffle is exact.
    Arrow-native hash aggregation (no pandas boxing)."""
    out = t.group_by(["mention", "obj", "obj_label"],
                     use_threads=False).aggregate([("n", "sum")])
    return out.rename_columns(["mention", "obj", "obj_label", "n"])


def canonicalize_mentions(triples_ds, *, extra_combine: bool | None = None):
    """Entity canonicalization: normalized surface form -> canonical term
    (most frequent ontology id for that surface form; ties -> lexicographic
    smallest id).

    Shape: per-batch combiner -> sort shuffle on mention -> vectorized
    per-block reduce.  Why this shape:
      * the combiner collapses a hot surface form ("chicken breast" in 25%
        of pages) to ONE row per batch before any data moves — the batch id
        is an implicit salt, so the shuffle volume is vocabulary x n_batches,
        not corpus size;
      * Ray's sort assigns every row with equal key to exactly one output
        partition (boundary assignment is a pure function of the key), so a
        per-block pandas reduce is exact — and ~100x cheaper than
        ``groupby().map_groups`` (one Python call per group) or
        ``groupby().aggregate`` (AggregateFn overhead per block dominates);
      * at 10^12 documents the per-key partial count (= n_batches) itself
        grows unbounded; ``extra_combine`` inserts a further barrier-free
        combine round — bundles of 262144 partial rows are re-summed
        (``_sum_partial_counts``, associative), shrinking any key's partial
        population by the bundling factor.  One round per ~3 orders of
        magnitude of batch count keeps every key's partials block-sized.
        The guard is ON by default (``None`` -> True): it is streaming
        (no barrier), exact at any application count, and measured
        cost-free at bench scale (sf0.1 warm: 4.45 s off vs 4.49 s on —
        inside run-to-run noise), so there is nothing to size-switch;
        pass False only to benchmark the raw two-stage shape.
    ``map_batches(batch_size=None)`` is required: a numeric batch_size would
    re-split sorted blocks mid-key and break key locality.
    """
    # the large batch_size makes Ray BUNDLE many small upstream blocks into
    # one combiner task, so the combiner both pre-aggregates and coalesces
    # block count ahead of the shuffle — sort cost grows with blocks^2
    # (each map block cuts a slice per reduce partition), and a Repartition
    # op would add a pipeline barrier for the same effect
    partials = triples_ds.map_batches(
        _partial_mention_counts, batch_format="pyarrow", batch_size=65536
    )
    if extra_combine is None or extra_combine:
        partials = partials.map_batches(
            _sum_partial_counts, batch_format="pyarrow", batch_size=262144
        )
    return partials.sort("mention").map_batches(
        _reduce_canonical_block, batch_format="pandas", batch_size=None
    )


def _block_dedup_sorted(t: pa.Table) -> pa.Table:
    """Per-key lexicographic-min dedup of one Arrow block.

    Used BOTH as the pre-shuffle combiner and as the post-sort reduce: "keep
    the full-row lexicographic minimum per (subj,pred,obj)" is associative,
    so local-then-global application equals one global pass (a keep='first'
    arrival-order combiner would discard the global minimum nondeterministically).
    Post-sort, each key lives in exactly one block (boundary assignment is a
    pure function of the key), making the second application exact — and the
    local sort keeps the dataset globally ordered on the triple key.

    Pure Arrow kernels (r3): the r2 pandas version spent most of its 25
    CPU-s/1M-pages boxing six string columns into Python objects and back;
    sort_indices + take + a shifted-equality run mask do the same reduction
    with zero boxing, shrinking the combiner tail that dominates the 4N
    scaling profile."""
    import numpy as np

    if len(t) == 0:
        return t
    # dictionary-encoded columns sort by code order; decode first
    cols = {}
    for name in t.column_names:
        c = t[name]
        if pa.types.is_dictionary(c.type):
            c = pc.cast(c, pa.string())
        cols[name] = c
    t = pa.table(cols)
    idx = pc.sort_indices(
        t, sort_keys=[(c, "ascending") for c in t.column_names]
    )
    t = t.take(idx)
    n = len(t)
    if n == 1:
        return t
    same_as_prev = np.ones(n - 1, dtype=bool)
    for key in ("subj", "pred", "obj"):
        a = t[key].combine_chunks()
        same_as_prev &= pc.equal(
            a.slice(1), a.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
    keep = np.empty(n, dtype=bool)
    keep[0] = True
    keep[1:] = ~same_as_prev
    return t.filter(pa.array(keep))




_WIRE_ENCODE_COLS = ("obj_label", "mention", "status")


def _dict_encode_payload(t: pa.Table) -> pa.Table:
    """Dictionary-encode the payload (non-key) triple columns ahead of the
    sort shuffle — the NIC-byte-oriented wire format for multi-node runs
    (see dedup_triples ``wire_encode``)."""
    cols = {}
    for name in t.column_names:
        c = t[name]
        if name in _WIRE_ENCODE_COLS and not pa.types.is_dictionary(c.type):
            c = pc.dictionary_encode(c.combine_chunks())
        cols[name] = c
    return pa.table(cols)


def dedup_triples(triples_ds, *, block_fn=None, wire_encode: bool = False):
    """Exact (subj, pred, obj) dedup, one shuffle, fully vectorized:
    per-batch local dedup (combiner) -> global sort on the triple key
    (equal keys are guaranteed co-partitioned) -> per-block drop_duplicates.
    The result is ALSO globally sorted by (subj, pred, obj), so graph
    materialization needs no second shuffle.  ``groupby().map_groups`` and
    ``groupby().aggregate`` were measured ~8x and ~2x the cost of the whole
    rest of the pipeline at 20k pages.

    ``block_fn`` (Arrow table -> Arrow table | pandas DataFrame) fuses a
    per-subject consumer pass INTO the post-sort reduce task, where the
    whole sorted range partition is in hand.  This is the ONLY placement
    where "group on subj per block" is safe for a pathologically hot
    subject: the sort itself never re-splits its output partitions
    (functions/groupagg.py contract), but the dedup map's OWN output
    blocks are dynamically re-split past ``target_max_block_size``, so a
    subject whose deduped rows exceed the block target WOULD arrive
    fragmented at any downstream ``map_batches`` (advisor r4; pinned by
    tests/test_kg_pipeline.py hot-subject case).  cooccurrence_edges,
    negative_samples and density_filter all pass their per-page reduction
    here instead of mapping over the returned Dataset.

    ``wire_encode=True`` dictionary-encodes the payload columns
    (obj_label, mention, status — ~half the row bytes) between the
    combiner and the sort; the post-sort reduce decodes, so the output is
    byte-identical either way (pinned by
    tests/test_kg_pipeline.py::test_dedup_wire_encode_paths_identical).
    Measured SLOWER single-node twice (see the combiner comment below —
    shared-memory object store, encode CPU buys nothing), but on a
    multi-node cluster where the sort crosses NICs the byte savings win;
    the flag ships the experiment so a real deployment flips it without
    re-deriving it."""
    # batch_size bundles matcher output blocks into one dedup task: local
    # combining AND block-count coalescing ahead of the shuffle in a single
    # streaming stage (no Repartition barrier); see canonicalize_mentions
    # for the blocks^2 sort-cost rationale.  131072: under push-based
    # shuffle the sort's per-row cost is dominated by range-splitting into
    # P partitions and shipping B x P slices (P tracks the combiner's
    # output block count), so fewer/bigger blocks win — measured at 4M
    # pages / 32 CPUs: 131k 107.7-111.7 s vs 32k 133.9 s vs 262k 126.3 s
    # (262k's fat final-reduce blocks serialize after the pool drains).
    # The r3-interim 32k choice was tuned for the simple-shuffle sort that
    # push-based shuffle replaced.
    #
    # Measured negative result (r4): re-dictionary-encoding the payload
    # columns (obj_label, mention, status — ~half the row bytes) between
    # the combiner and the sort is consistently 1-2 s SLOWER at 1M
    # pages/32 CPUs (interleaved pairs 26.7/28.5, 26.3/26.7, 24.0/25.6):
    # on one node the object store is shared memory, so the byte savings
    # buy nothing while the encode + per-chunk dictionary handling in the
    # sort costs real CPU.  On a multi-node cluster where the sort crosses
    # NICs the trade flips — revisit there; plain strings here.
    ds = triples_ds.map_batches(
        _block_dedup_sorted, batch_format="pyarrow", batch_size=131072
    )
    if wire_encode:
        # fuses with the combiner task (adjacent task-pool maps) — no
        # extra exchange, just the encode kernel on the shuffle input
        ds = ds.map_batches(_dict_encode_payload, batch_format="pyarrow")
    # Sort on subj ALONE (not the full triple key): equal (subj,pred,obj)
    # rows share a subj, so single-key range partitioning still co-locates
    # every duplicate group (dedup stays exact — the block reduce re-sorts
    # the whole block anyway), while additionally co-locating each WHOLE
    # SUBJECT — the contract the per-page consumers (cooccurrence_edges,
    # negative_samples, density_filter) group on.  A composite-key sort
    # places range boundaries at (subj, mid-pred) points and splits one
    # page's triples across two blocks — measured: 113 of 124 boundaries
    # split a subject on a 24k-triple fixture at a 16 KiB block target,
    # double-counting 430 of 12000 co-occurrence pairs in one run (the
    # same bug class the sf0.1 sweep caught in orders_running_window;
    # latent at gate scales where the deduped set fits in one block).
    # Global order is unchanged: blocks are subj ranges and the block
    # reduce leaves each block fully (subj, pred, obj)-sorted, so the
    # concatenation stays globally composite-sorted for materialize_graph.
    if block_fn is None:
        return ds.sort("subj").map_batches(
            _block_dedup_sorted, batch_format="pyarrow", batch_size=None
        )

    def dedup_then(t: pa.Table):
        return block_fn(_block_dedup_sorted(t))

    return ds.sort("subj").map_batches(
        dedup_then, batch_format="pyarrow", batch_size=None
    )


def materialize_graph(triples_ds, out_dir: str | None = None):
    """Sorted, deduplicated graph; written to Parquet when *out_dir* given.

    ``dedup_triples`` already leaves the data globally sorted by
    (subj, pred, obj) — no second shuffle here."""
    ds = dedup_triples(triples_ds)
    if out_dir:
        ds = ds.materialize()
        ds.write_parquet(out_dir)
    return ds


def degree_stats(triples_ds):
    """Per-ontology-term graph degree over the DEDUPED triple set: total
    distinct triples naming the term and distinct subject pages linking to
    it — the fan-in profile that drives KG skew decisions (hot terms are
    exactly the salted-key candidates in canonicalization).

    Shape: triple dedup leaves unique (subj, pred, obj) rows; a per-batch
    (obj, subj) partial count collapses the pred dimension before the ONE
    obj sort, and the co-located final block computes the exact distinct
    subject count (equal obj provably lives in one block, see
    functions/groupagg.py).  Shuffle volume is <= one row per distinct
    (obj, subj) pair per batch — never triple-scale."""
    import pandas as pd

    from lexmapr_ray.functions.groupagg import sorted_group_reduce

    deduped = dedup_triples(triples_ds).map_batches(
        lambda t: t.select(["subj", "obj"]), batch_format="pyarrow"
    )

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"obj": pd.Series([], dtype="object"),
                                 "subj": pd.Series([], dtype="object"),
                                 "cnt": pd.Series([], dtype="int64")})
        return df.groupby(["obj", "subj"], as_index=False, sort=False) \
            .size().rename(columns={"size": "cnt"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"obj": pd.Series([], dtype="object"),
                                 "n_triples": pd.Series([], dtype="int64"),
                                 "n_pages": pd.Series([], dtype="int64")})
        g = df.groupby("obj", sort=True).agg(
            n_triples=("cnt", "sum"), n_pages=("subj", "nunique")).reset_index()
        g["n_triples"] = g["n_triples"].astype("int64")
        g["n_pages"] = g["n_pages"].astype("int64")
        return g

    return sorted_group_reduce(deduped, "obj", pair_partial, final)


def mention_contexts(
    pages_ds,
    lexicon_ref=None,
    *,
    langs: tuple = ("en",),
    concurrency=None,
    batch_size: int = 256,
):
    """pages Dataset -> per-(sentence, term) evidence-context rows.

    KG provenance extraction: each matched sentence mention with its
    neighbor sentences, one row per distinct linked term
    (stages/match.py::MentionContexts).  Embarrassingly parallel actor
    pool — same broadcast/pool contract as :func:`extract_triples`; the
    only wide op is the presentation sort."""
    if lexicon_ref is None:
        lexicon_ref = broadcast_lexicon()
    if concurrency is None:
        import ray

        cap = max(2, (int(ray.cluster_resources().get("CPU", 4)) * 7) // 8)
        concurrency = (2, cap)
    from lexmapr_ray.stages.match import MentionContexts

    ds = pages_ds.map_batches(extract_text_stage, batch_format="pyarrow")
    return ds.map_batches(
        MentionContexts,
        fn_constructor_kwargs={"lexicon": [lexicon_ref], "langs": langs},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    ).sort(["subj", "mention_idx", "obj"])


def extract_triples_and_contexts(
    pages_ds,
    lexicon_ref=None,
    *,
    bucket: bool = False,
    langs: tuple = ("en",),
    concurrency=None,
    batch_size: int = 256,
):
    """ONE matcher pass -> (triples Dataset, contexts Dataset).

    A user materializing both the graph AND its evidence contexts
    previously paid the matcher-bound cascade twice
    (:func:`extract_triples` + :func:`mention_contexts`); the fused
    :class:`~lexmapr_ray.stages.match.FusedMatcher` actor emits both row
    families from one pass with a per-page cascade memo (~1x matcher cost
    on short-sentence web text — measured 2.84x faster than the two
    separate passes at 100k pages / 32 CPUs, BASELINE.md: shared cascade
    runs plus one actor-pool spin-up instead of two).

    The tagged union is materialized ONCE so the two filtered views don't
    re-execute the matcher; the materialized rows are extraction OUTPUT
    (triples + matched-window contexts), orders below page bytes.  Each
    family comes back byte-identical to its standalone stage (pinned by
    tests/test_kg_pipeline.py::test_fused_matcher_equals_separate_passes).
    """
    if lexicon_ref is None:
        lexicon_ref = broadcast_lexicon()
    if concurrency is None:
        import ray

        cap = max(2, (int(ray.cluster_resources().get("CPU", 4)) * 7) // 8)
        concurrency = (2, cap)
    from lexmapr_ray.stages.match import CONTEXTS_SCHEMA, FusedMatcher

    ds = pages_ds.map_batches(extract_text_stage, batch_format="pyarrow")
    combined = ds.map_batches(
        FusedMatcher,
        fn_constructor_kwargs={"lexicon": [lexicon_ref], "bucket": bucket,
                               "langs": langs},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    ).materialize()

    trip_cols = ["subj", "pred", "obj", "obj_label", "mention", "status"]

    def take_triples(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["family"], "triple")).select(trip_cols)

    ctx_cols = list(CONTEXTS_SCHEMA.names)

    def take_ctx(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["family"], "ctx")).select(ctx_cols)

    triples = combined.map_batches(take_triples, batch_format="pyarrow")
    contexts = combined.map_batches(take_ctx, batch_format="pyarrow") \
        .sort(["subj", "mention_idx", "obj"])
    return triples, contexts


def triple_confidence(triples_ds):
    """Per-(pred, obj) assertion confidence over the RAW (pre-dedup)
    extraction stream — the evidence-scoring pass that turns extracted
    triples into a ranked KG: evidence volume (``n_mentions`` raw rows),
    page support (``n_pages`` distinct subjects), surface diversity
    (``n_surfaces`` distinct mention strings), and ``conf_permille`` =
    floor(1000 * n_pages / max n_pages among assertions of the SAME
    predicate) — an integer-exact support score normalized per predicate
    so full-term and component links are ranked within their own class.

    Shape: per-batch Arrow group_by collapses the raw stream to distinct
    (pred, obj, subj, mention) quadruples with counts (a hot assertion
    repeated across a batch ships once), ONE (pred, obj) sort co-locates
    each assertion's quadruples, and the per-block final computes the
    exact distinct counts.  The assertion-level stats table (ontology x
    predicate scale, orders below corpus) is materialized once so the
    per-predicate maxima (<= |preds| = 3 rows) fold on the driver without
    re-running the matcher; the annotate step is a stateless map over the
    materialized stats."""
    import pandas as pd

    from lexmapr_ray.functions.groupagg import sorted_group_reduce

    def quad_partial(t: pa.Table) -> pa.Table:
        sel = t.select(["pred", "obj", "subj", "mention"])
        sel = pa.table({c: pc.cast(sel[c], pa.string())
                        for c in sel.column_names})
        out = sel.group_by(["pred", "obj", "subj", "mention"],
                           use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(["pred", "obj", "subj", "mention", "cnt"])

    quads = triples_ds.map_batches(quad_partial, batch_format="pyarrow")

    _QCOLS = ["pred", "obj", "subj", "mention", "cnt"]

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64" if c == "cnt"
                                              else "object") for c in _QCOLS})
        return df.groupby(["pred", "obj", "subj", "mention"],
                          as_index=False, sort=False)["cnt"].sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "pred": pd.Series([], dtype="object"),
                "obj": pd.Series([], dtype="object"),
                "n_mentions": pd.Series([], dtype="int64"),
                "n_pages": pd.Series([], dtype="int64"),
                "n_surfaces": pd.Series([], dtype="int64")})
        g = df.groupby(["pred", "obj"], sort=True).agg(
            n_mentions=("cnt", "sum"), n_pages=("subj", "nunique"),
            n_surfaces=("mention", "nunique")).reset_index()
        for c in ("n_mentions", "n_pages", "n_surfaces"):
            g[c] = g[c].astype("int64")
        return g

    stats = sorted_group_reduce(quads, ["pred", "obj"], combine, final) \
        .materialize()  # assertion-scale, never corpus-scale

    def max_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"pred": pd.Series([], dtype="object"),
                                 "mx": pd.Series([], dtype="int64")})
        return df.groupby("pred", as_index=False)["n_pages"].max() \
            .rename(columns={"n_pages": "mx"})

    # |preds| = 3 fixed predicate constants — a domain-bounded aggregate
    pred_max: dict[str, int] = {}
    for r in stats.map_batches(max_partial, batch_format="pandas").take_all():
        pred_max[r["pred"]] = max(pred_max.get(r["pred"], 0), int(r["mx"]))

    def annotate(df: pd.DataFrame) -> pd.DataFrame:
        mx = df["pred"].map(pred_max).to_numpy(np.int64)
        df = df.copy()
        df["conf_permille"] = (1000 * df["n_pages"].to_numpy(np.int64)) // mx
        return df

    return stats.map_batches(annotate, batch_format="pandas")


def host_entity_profile(triples_ds, docs_per_host: int = 16):
    """Per-(host, ontology term) assertion profile over the deduped graph:
    triple count and distinct-page support — the entity-level host profile
    that turns KG extraction into host curation (a host whose profile is
    one hot entity across thousands of pages is a template farm; the C4
    recipe blocks whole hosts, not documents).  Host model mirrors
    webgraph.DOCS_PER_HOST (host id = doc_id // 16), so the SQL oracle
    re-derives it arithmetically.

    Shape: same ONE-sort grouped reduce as :func:`degree_stats`, keyed
    (host, obj); the per-batch (host, obj, subj) collapse bounds a hot
    (host, term) pair at one row per batch."""
    import pandas as pd

    from lexmapr_ray.functions.groupagg import sorted_group_reduce

    deduped = dedup_triples(triples_ds).map_batches(
        lambda t: t.select(["subj", "obj"]), batch_format="pyarrow")

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"host": pd.Series([], dtype="object"),
                                 "obj": pd.Series([], dtype="object"),
                                 "subj": pd.Series([], dtype="object"),
                                 "cnt": pd.Series([], dtype="int64")})
        doc = df["subj"].astype(str).str.removeprefix("doc://").astype("int64")
        df = df.assign(host="host" + (doc // docs_per_host).astype(str))
        return df.groupby(["host", "obj", "subj"], as_index=False,
                          sort=False, observed=True).size() \
            .rename(columns={"size": "cnt"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"host": pd.Series([], dtype="object"),
                                 "obj": pd.Series([], dtype="object"),
                                 "n_triples": pd.Series([], dtype="int64"),
                                 "n_pages": pd.Series([], dtype="int64")})
        g = df.groupby(["host", "obj"], sort=True, observed=True).agg(
            n_triples=("cnt", "sum"), n_pages=("subj", "nunique")).reset_index()
        g["n_triples"] = g["n_triples"].astype("int64")
        g["n_pages"] = g["n_pages"].astype("int64")
        return g

    return sorted_group_reduce(deduped, ["host", "obj"], pair_partial, final)


def density_filter(triples_ds, sf_dir: str, min_density_permille: int = 10):
    """KG-density corpus curation: keep documents whose extraction yield —
    distinct deduped triples per token, in integer permille — clears a
    threshold.  The cross-family pass that turns the KG extractor into a
    training-data quality signal: entity-dense pages are topical prose,
    entity-free pages are navigation/boilerplate.

    Output (doc_id, n_triples, n_tokens, density_permille), doc-sorted,
    English docs only (the matcher's language gate).  density_permille =
    floor(1000 * n_triples / n_tokens); n_tokens = engine token count
    (never 0 for a doc that produced a triple, since a mention implies a
    token).

    Shape: the per-page triple count runs as :func:`dedup_triples`'s fused
    ``block_fn`` — inside the post-sort reduce task where every subject is
    provably whole even past ``target_max_block_size`` (see dedup_triples)
    — the subj url parses back to doc_id arithmetically, and a bucketed
    hash join attaches the documents-side token counts (size-switched
    semi-join semantics are not needed — both sides are page-scale,
    co-partitioned by the join's own bucketing)."""
    import pandas as pd

    from lexmapr_ray.functions.joins import bucketed_hash_join

    def page_counts(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_triples": pd.Series([], dtype="int64")})
        df = pa.table({"subj": pc.cast(t["subj"], pa.string())}).to_pandas()
        g = df.groupby("subj", sort=False).size().reset_index(name="n_triples")
        g["doc_id"] = g["subj"].str.removeprefix("doc://").astype("int64")
        g["n_triples"] = g["n_triples"].astype("int64")
        return g[["doc_id", "n_triples"]]

    counts = dedup_triples(triples_ds, block_fn=page_counts)

    from lexmapr_ray.stages.textstats import _read_documents, _token_counts

    docs = _read_documents(sf_dir, ["doc_id", "lang", "text"])

    def tok(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["lang"], "en")
        t = t.filter(keep)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_tokens": pa.array(_token_counts(t["text"]), pa.int64()),
        })

    toks = docs.map_batches(tok, batch_format="pyarrow")

    joined = bucketed_hash_join(
        counts, toks, on="doc_id",
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("n_triples", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("n_tokens", pa.int64())]),
    )

    def density(t: pa.Table) -> pa.Table:
        tri = t["n_triples"].to_numpy(zero_copy_only=False).astype(np.int64)
        tok_n = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (1000 * tri) // np.maximum(tok_n, 1)
        out = pa.table({
            "doc_id": t["doc_id"],
            "n_triples": t["n_triples"],
            "n_tokens": t["n_tokens"],
            "density_permille": pa.array(d, pa.int64()),
        })
        return out.filter(pc.greater_equal(out["density_permille"],
                                           min_density_permille))

    return joined.map_batches(density, batch_format="pyarrow").sort("doc_id")


def snapshot_diff(triples_a, triples_b):
    """Temporal KG maintenance: the assertion-level diff between two crawl
    snapshots' extracted graphs — every (subj, pred, obj) present in
    exactly one snapshot, tagged ``added`` (new crawl only) or ``removed``
    (old crawl only).  The downstream of an incremental ingest: apply the
    adds, retract the removes, leave the intersection untouched.

    Shape: each side collapses per batch to distinct (subj, pred, obj)
    keys carrying an in_a/in_b flag pair, the tagged union goes through
    ONE triple-key sort (not two dedup sorts plus a join), and the
    co-located final ORs the flags and keeps the symmetric difference.
    Shuffle volume is <= one row per distinct triple per batch per side."""
    import pandas as pd

    _DCOLS = ["subj", "pred", "obj", "in_a", "in_b"]

    def tag(a_flag: int, b_flag: int):
        def f(t: pa.Table) -> pa.Table:
            sel = t.select(["subj", "pred", "obj"])
            sel = pa.table({c: pc.cast(sel[c], pa.string())
                            for c in sel.column_names})
            out = sel.group_by(["subj", "pred", "obj"],
                               use_threads=False).aggregate([])
            n = out.num_rows
            return out.append_column(
                "in_a", pa.array(np.full(n, a_flag, dtype=np.int64))
            ).append_column(
                "in_b", pa.array(np.full(n, b_flag, dtype=np.int64)))
        return f

    tagged = triples_a.map_batches(tag(1, 0), batch_format="pyarrow").union(
        triples_b.map_batches(tag(0, 1), batch_format="pyarrow"))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(
                [], dtype="int64" if c in ("in_a", "in_b") else "object")
                for c in _DCOLS})
        return df.groupby(["subj", "pred", "obj"], as_index=False,
                          sort=False)[["in_a", "in_b"]].max()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = combine(df)
        if len(g) == 0:
            return pd.DataFrame({"subj": pd.Series([], dtype="object"),
                                 "pred": pd.Series([], dtype="object"),
                                 "obj": pd.Series([], dtype="object"),
                                 "change": pd.Series([], dtype="object")})
        g = g[g["in_a"] != g["in_b"]].copy()
        g["change"] = np.where(g["in_b"] == 1, "added", "removed")
        return g.sort_values(["subj", "pred", "obj"])[
            ["subj", "pred", "obj", "change"]]

    from lexmapr_ray.functions.groupagg import sorted_group_reduce

    return sorted_group_reduce(tagged, ["subj", "pred", "obj"],
                               combine, final)


def negative_samples(triples_ds):
    """In-page hard-negative sampling for KG-embedding / contrastive
    training: for each deduped (subj, pred, obj), corrupt the OBJECT with
    another entity linked from the SAME page — the 'in-batch negatives'
    pattern, made deterministic.  Same-page entities share context, so
    these are hard negatives, and the page-local domain means NO global
    entity table is shuffled or broadcast.  The draw is an md5-based
    integer offset (1 + h % (n-1), h = 32-bit prefix of
    md5('subj\\0pred\\0obj')), so neg_obj != obj by construction and the
    DuckDB oracle recomputes the same value arithmetically.  Pages linking
    a single entity yield no negative and are dropped.

    Shape: the per-page draw runs as :func:`dedup_triples`'s fused
    ``block_fn`` — inside the post-sort reduce task where every subject is
    provably whole even past ``target_max_block_size`` (see dedup_triples)
    — and is block-level vectorized: ONE pandas merge builds per-row
    (position-in-page, page-size) from the per-page sorted-unique obj
    table, md5 runs over pre-concatenated key strings, and the draw plus
    the neg-obj gather are index arithmetic + a second merge.  The only
    per-row Python left is the md5 call itself (not vectorizable)."""
    import hashlib

    import pandas as pd

    _NCOLS = ["subj", "pred", "obj", "neg_obj"]
    _EMPTY = {c: pd.Series([], dtype="object") for c in _NCOLS}

    def neg(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(_EMPTY)
        rows = pd.DataFrame({
            "subj": t["subj"].to_pandas().astype(str),
            "pred": t["pred"].to_pandas().astype(str),
            "obj": t["obj"].to_pandas().astype(str),
        })
        # per-page sorted-unique obj table with in-page position and size
        uniq = rows[["subj", "obj"]].drop_duplicates().sort_values(
            ["subj", "obj"], kind="mergesort").reset_index(drop=True)
        uniq["pos"] = uniq.groupby("subj", sort=False).cumcount()
        sizes = uniq.groupby("subj", sort=False)["obj"].size()
        rows = rows.merge(uniq, on=["subj", "obj"], how="left")
        rows["n"] = rows["subj"].map(sizes).to_numpy(np.int64)
        rows = rows[rows["n"] >= 2]
        if len(rows) == 0:
            return pd.DataFrame(_EMPTY)
        # key built inside the md5 loop: pandas Series '+' SILENTLY DROPS
        # NUL chars (numpy str ufunc truncation), so the '\x00'-joined key
        # cannot be vectorized as a string column
        md5 = hashlib.md5
        h = np.fromiter(
            (int.from_bytes(
                md5(f"{s}\x00{p}\x00{o}".encode()).digest()[:4], "big")
             for s, p, o in zip(rows["subj"].to_numpy(),
                                rows["pred"].to_numpy(),
                                rows["obj"].to_numpy())),
            dtype=np.int64, count=len(rows))
        n = rows["n"].to_numpy(np.int64)
        idx = (rows["pos"].to_numpy(np.int64) + 1 + h % (n - 1)) % n
        pick = pd.DataFrame({"subj": rows["subj"].to_numpy(), "pos": idx})
        picked = pick.merge(uniq.rename(columns={"obj": "neg_obj"}),
                            on=["subj", "pos"], how="left")
        return pd.DataFrame({
            "subj": rows["subj"].to_numpy(),
            "pred": rows["pred"].to_numpy(),
            "obj": rows["obj"].to_numpy(),
            "neg_obj": picked["neg_obj"].to_numpy(),
        })

    return dedup_triples(triples_ds, block_fn=neg)


def cooccurrence_edges(triples_ds, *, max_page_terms: int | None = 128):
    """Term co-mention edges: for every pair of ontology terms linked from
    the same page, the number of distinct pages naming both — the
    edge-weighting pass that turns extracted triples into a term graph.

    ``max_page_terms`` is the ENFORCED hub cap: a page naming more than
    this many distinct terms is dropped from pair generation entirely
    (the C4 recipe's move — a link-farm / index page naming thousands of
    entities is boilerplate, and its C(k,2) pair explosion is quadratic).
    Real web pages name dozens of terms, so the default 128 never fires
    on organic text; pass ``None`` to disable.  Pinned by the adversarial
    hub fixture in tests/test_skew_stress.py.

    Shape: the per-page pair emit runs as :func:`dedup_triples`'s fused
    ``block_fn`` — inside the post-sort reduce task where every subject
    is provably whole even past ``target_max_block_size`` (see
    dedup_triples) — C(k,2) rows for a page with k <= cap distinct terms;
    one grouped count on (obj_a, obj_b) finishes."""
    import pandas as pd

    from lexmapr_ray.functions.groupagg import grouped_sum_count

    def page_pairs(t: pa.Table) -> pd.DataFrame:
        empty = pd.DataFrame({"obj_a": pd.Series([], dtype="object"),
                              "obj_b": pd.Series([], dtype="object")})
        if t.num_rows == 0:
            return empty
        d = pa.table({"subj": pc.cast(t["subj"], pa.string()),
                      "obj": pc.cast(t["obj"], pa.string())}) \
            .to_pandas().drop_duplicates()
        if max_page_terms is not None:
            k = d.groupby("subj", sort=False)["obj"].transform("size")
            d = d[k <= max_page_terms]
            if len(d) == 0:
                return empty
        m = d.merge(d, on="subj")
        m = m[m["obj_x"] < m["obj_y"]]
        return m.rename(columns={"obj_x": "obj_a", "obj_y": "obj_b"}) \
            [["obj_a", "obj_b"]]

    pairs = dedup_triples(triples_ds, block_fn=page_pairs)
    return grouped_sum_count(pairs, ["obj_a", "obj_b"], count_alias="n_pages")


def term_components(triples_ds, *, num_buckets: int = 32,
                    max_iters: int | None = None):
    """Connected components of the term CO-MENTION graph: ontology terms
    linked whenever some page mentions both; ``component`` = the
    lexicographically smallest term id reachable — the coarse topical
    clusters a KG build reports before any embedding step.

    Reuses the generic distributed min-label + pointer-jump loop
    (:func:`lexmapr_ray.functions.components.min_label_components`,
    factored from near-dup clustering) with STRING node ids — labels are
    any totally ordered key, so no term->int densification pass is needed.
    Node and edge sets are vocabulary-scale (bounded by the ontology, not
    the corpus), but both are built distributed from corpus-scale triples;
    nothing lands on the driver."""
    from lexmapr_ray.functions.components import min_label_components
    from lexmapr_ray.functions.groupagg import grouped_sum_count

    edges = cooccurrence_edges(triples_ds).map_batches(
        lambda t: t.select(["obj_a", "obj_b"]), batch_format="pyarrow"
    )
    nodes = grouped_sum_count(
        dedup_triples(triples_ds).map_batches(
            lambda t: t.select(["obj"]), batch_format="pyarrow"),
        "obj",
    )
    labels = min_label_components(
        edges, nodes, a_col="obj_a", b_col="obj_b", node_col="obj",
        key_type=pa.string(), num_buckets=num_buckets, max_iters=max_iters,
    )
    return labels.map_batches(
        lambda df: df.rename(columns={"node": "term",
                                      "label": "component"}),
        batch_format="pandas",
    ).sort("term")


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


def _ancestor_closure(term: str, parents) -> set[str]:
    """Ancestor set of ``term`` (inclusive): BFS over ``parents`` — a
    ``{child: [parent, ...]}`` dict or a ``term -> iterable`` callable —
    with a visited set (diamonds visited once, cycles terminate) and no
    expansion past ``bfo_0000001`` (BFO's root entity, the same
    hierarchy-top convention as matcher.get_term_parent_hierarchies)."""
    get = parents if callable(parents) else lambda n: parents.get(n, ())
    seen = {term}
    stack = [term]
    while stack:
        node = stack.pop()
        if node == "bfo_0000001":
            continue
        for p in get(node):
            if p not in seen:
                seen.add(p)
                stack.append(p)
    return seen


def namespace_parents(term: str):
    """Deterministic stand-in hierarchy when no ontology is configured
    (the reference's default resources ship an EMPTY parents table —
    real parent edges arrive only with a fetched ontology): every term's
    parent is its ontology namespace (``CHEBI_24433 -> ns_chebi``) and
    every namespace's parent is ``owl_thing``.  A pure string rule, so
    the SQL oracle regenerates the identical closure."""
    if term == "owl_thing":
        return ()
    if term.startswith("ns_"):
        return ("owl_thing",)
    return ("ns_" + term.split("_")[0].lower(),)


def ancestor_rollup(triples_ds, parents):
    """Ontology-level KG rollup: triple and distinct-term counts
    aggregated up the parent hierarchy's transitive closure — the
    "how much evidence sits under FOODON vs CHEBI vs each mid-level
    class" view that drives ontology-subtree curation and coverage
    audits.  For every ancestor ``anc`` (terms count as their own
    ancestor): ``n_triples`` = deduped triples whose obj lies under
    ``anc``, ``n_terms`` = distinct such objs.

    ``parents`` is a ``{child: [parents]}`` dict, a ``ray.ObjectRef`` to
    one (broadcast once, read per task), or a pure ``term -> parents``
    callable (:func:`namespace_parents` when no ontology is loaded).

    Scale shape: the ``degree_stats`` shape lifted up the ontology DAG —
    everything after the triple dedup is VOCABULARY-bounded: per-batch
    (anc, obj) partial counts with the closure memoized per task over
    the broadcast table, one anc sort, co-located exact distinct-term
    finals; shuffle <= one row per (anc, obj) per batch, never
    triple-scale.  Closure depth multiplies only the vocabulary-sized
    partials, not the corpus."""
    import pandas as pd
    import ray

    from lexmapr_ray.functions.groupagg import sorted_group_reduce

    deduped = dedup_triples(triples_ds).map_batches(
        lambda t: t.select(["obj"]), batch_format="pyarrow")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"anc": pd.Series([], dtype="object"),
                              "obj": pd.Series([], dtype="object"),
                              "cnt": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        table = ray.get(parents) if isinstance(parents, ray.ObjectRef) \
            else parents
        memo: dict[str, set] = {}
        anc_col, obj_col, cnt_col = [], [], []
        for obj, cnt in df.groupby("obj", sort=False).size().items():
            if obj not in memo:
                memo[obj] = _ancestor_closure(obj, table)
            for anc in memo[obj]:
                anc_col.append(anc)
                obj_col.append(obj)
                cnt_col.append(int(cnt))
        return pd.DataFrame({"anc": anc_col, "obj": obj_col,
                             "cnt": np.asarray(cnt_col, dtype=np.int64)})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"anc": pd.Series([], dtype="object"),
                                 "n_triples": pd.Series([], dtype="int64"),
                                 "n_terms": pd.Series([], dtype="int64")})
        g = df.groupby("anc", sort=True).agg(
            n_triples=("cnt", "sum"), n_terms=("obj", "nunique")).reset_index()
        g["n_triples"] = g["n_triples"].astype("int64")
        g["n_terms"] = g["n_terms"].astype("int64")
        return g

    return sorted_group_reduce(deduped, "anc", partial, final)


# ---------------------------------------------------------------------------
# Anchor-text entity linking
# ---------------------------------------------------------------------------

_ANCHOR_RE = None


def anchor_text_triples(sf_dir: str, lexicon_ref=None):
    """Anchor-text entity linking: run the LexMapr matcher over the anchor
    TEXT parsed out of raw html and emit (target_url, pred, term) triples —
    link labels describe the page they point AT, so anchors are the
    highest-precision mention source a web-scale KG build has (the same
    matcher cascade as the flagship, a different mention extractor;
    reference semantics anchor: lexmapr/pipeline.py's per-sample run).

    Scale shape: stateless anchor parse (compiled regex; emits only
    (url, text, lang) mention rows — html never reaches the matcher pool)
    -> the SAME broadcast-lexicon matcher actor pool as
    :func:`extract_triples` (``pre_extracted=True``) -> the standard
    sorted triple dedup.  Anchors pointing at one target from many pages
    produce byte-identical triples, so the dedup is unambiguous.

    Oracle: the anchor text is ``_MATCHABLE_PHRASES[dst % 20]`` by
    synthesis, so SQL regenerates the edge set arithmetically and joins
    the committed serial phrase->term mapping
    (``expected/op_anchor_phrase_terms.parquet``).
    """
    import re

    from lexmapr_ray.sources.pages import linked_pages_from_documents

    global _ANCHOR_RE
    if _ANCHOR_RE is None:
        _ANCHOR_RE = re.compile(rb'<a href="([^"]+)">([^<]*)</a>')

    pages = linked_pages_from_documents(sf_dir)
    anchor_re = _ANCHOR_RE

    def parse(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        texts: list[str] = []
        for h in t["html"].to_pylist():
            for m in anchor_re.finditer(h):
                # errors="replace": one non-UTF8 anchor byte in a hostile
                # crawl must not kill the task (advisor r4)
                urls.append(m.group(1).decode("utf-8", errors="replace"))
                texts.append(m.group(2).decode("utf-8", errors="replace"))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        })

    anchors = pages.map_batches(parse, batch_format="pyarrow")
    triples = extract_triples(anchors, lexicon_ref, pre_extracted=True)
    return materialize_graph(triples)
