"""Ray Data stages: HTML extraction and the mention-matcher actor pool.

The matcher is the stateful heart of the pipeline: a callable class passed to
``map_batches(MentionMatcher, concurrency=N)`` so the multi-MB lexicon is
loaded ONCE per actor (from a ``ray.put`` handle — one object-store copy per
node, zero-copy mapped by every actor on it) and reused across batches.
"""

from __future__ import annotations

import re

import pyarrow as pa

from lexmapr_ray.lexkit.lexicon import Lexicon, build_lexicon
from lexmapr_ray.lexkit.matcher import match_sample
from lexmapr_ray.sources.pages import extract_text

TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_label", pa.string()),
        ("mention", pa.string()),
        # repr of the micro-status rule trail; a plain string keeps every
        # downstream pandas/groupby stage list-free (Arrow list columns do
        # not round-trip pandas blocks cleanly in grouped operators)
        ("status", pa.string()),
    ]
)

PRED_FULL = "lexmapr:fullTermMatch"
PRED_COMPONENT = "lexmapr:componentMatch"
PRED_CLASSIFIED = "lexmapr:classifiedAs"

_SENTENCE_SPLIT = re.compile(r"[.!?;\n]+")

# Mentions longer than this are truncated for cost-bounding: the reference's
# own guard switches to contiguous n-grams at >=15 tokens
# (pipeline_helpers.py:255-273); web sentences beyond ~60 tokens add cost
# quadratically for negligible recall.
MAX_MENTION_TOKENS = 60


def segment_mentions(text: str, max_tokens: int = MAX_MENTION_TOKENS) -> list[str]:
    """Split page text into sentence-level mentions (the engine's 'sample')."""
    mentions = []
    for raw in _SENTENCE_SPLIT.split(text):
        raw = raw.strip()
        if not raw:
            continue
        toks = raw.split()
        if len(toks) > max_tokens:
            raw = " ".join(toks[:max_tokens])
        mentions.append(raw)
    return mentions


def segment_mention_windows(text: str, window_tokens: int = 32) -> list[str]:
    """Sentence split, then length-bounded windowing: each sentence longer
    than ``window_tokens`` yields consecutive token windows instead of one
    truncated mega-sentence.  :func:`segment_mentions` TRUNCATES at
    MAX_MENTION_TOKENS and drops the tail — reference-parity behavior for
    matching, but wrong for evidence extraction, which must cover the whole
    page (unpunctuated web text is one giant 'sentence')."""
    out = []
    for raw in _SENTENCE_SPLIT.split(text):
        raw = raw.strip()
        if not raw:
            continue
        toks = raw.split()
        for i in range(0, len(toks), window_tokens):
            out.append(" ".join(toks[i:i + window_tokens]))
    return out


CONTEXTS_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("obj", pa.string()),
        ("mention_idx", pa.int64()),
        ("mention", pa.string()),
        ("ctx_before", pa.string()),
        ("ctx_after", pa.string()),
    ]
)


class MentionContexts:
    """Actor-pool stage: pages batches in, evidence-context rows out.

    For every mention window (:func:`segment_mention_windows`) the matcher
    links to at least one ontology term, emit one row per DISTINCT matched
    term carrying the raw window plus its neighboring windows — the
    provenance snippet a KG reviewer (or a relation-extraction training
    set) needs next to the bare triple.  Same broadcast-lexicon /
    init-once contract as :class:`MentionMatcher`; reference parity
    anchor: lexmapr/pipeline.py keeps the original sample text beside each
    match for exactly this audit purpose."""

    def __init__(self, lexicon=None, langs: tuple = ("en",),
                 window_tokens: int = 32):
        import ray

        if isinstance(lexicon, (list, tuple)) and len(lexicon) == 1:
            lexicon = lexicon[0]
        if lexicon is None:
            lexicon = build_lexicon()
        elif isinstance(lexicon, ray.ObjectRef):
            lexicon = ray.get(lexicon)
        self.lexicon: Lexicon = lexicon
        self.langs = set(langs) if langs else None
        self.window_tokens = window_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [None] * len(urls)

        subj, obj, idx, men, bef, aft = [], [], [], [], [], []
        for url, text, lang in zip(urls, texts, langs):
            if self.langs and lang is not None and lang not in self.langs:
                continue
            ms = segment_mention_windows(text, self.window_tokens)
            for i, mention in enumerate(ms):
                r = match_sample(mention, self.lexicon)
                if not r.matched_components:
                    continue
                terms = sorted({c.rsplit(":", 1)[1]
                                for c in r.matched_components})
                before = ms[i - 1] if i > 0 else ""
                after = ms[i + 1] if i + 1 < len(ms) else ""
                for t in terms:
                    subj.append(url)
                    obj.append(t)
                    idx.append(i)
                    men.append(mention)
                    bef.append(before)
                    aft.append(after)
        return pa.Table.from_arrays(
            [pa.array(subj, pa.string()), pa.array(obj, pa.string()),
             pa.array(idx, pa.int64()), pa.array(men, pa.string()),
             pa.array(bef, pa.string()), pa.array(aft, pa.string())],
            schema=CONTEXTS_SCHEMA,
        )


FUSED_SCHEMA = pa.schema(
    [
        ("family", pa.string()),        # "triple" | "ctx"
        ("subj", pa.string()),
        ("pred", pa.string()),          # "" on ctx rows
        ("obj", pa.string()),
        ("obj_label", pa.string()),     # "" on ctx rows
        ("mention", pa.string()),
        ("status", pa.string()),        # "" on ctx rows
        ("mention_idx", pa.int64()),    # -1 on triple rows
        ("ctx_before", pa.string()),    # "" on triple rows
        ("ctx_after", pa.string()),     # "" on triple rows
    ]
)


class FusedMatcher:
    """Actor-pool stage emitting BOTH row families in one matcher pass:
    the triples of :class:`MentionMatcher` (``family='triple'``) and the
    evidence contexts of :class:`MentionContexts` (``family='ctx'``).

    The pipeline is matcher-bound (BASELINE.md), and the two families
    segment differently (sentence-truncate vs token windows), so a user
    materializing both previously paid the full cascade twice.  Here one
    actor runs both segmentations with a per-page memo on the cascade:
    every sentence of <= ``window_tokens`` tokens produces the SAME
    mention string in both segmentations, so its cascade runs once — on
    ordinary web text (short sentences dominate) the fused pass costs
    ~1x the matcher, not 2x.  Outputs are byte-identical to the two
    separate stages by construction (same functions, same inputs).

    Consumed via :func:`lexmapr_ray.pipelines.kg.extract_triples_and_contexts`,
    which materializes the tagged union ONCE (output-scale rows, never
    corpus/page bytes) and filters each family out of the shared result.
    """

    def __init__(self, lexicon=None, bucket: bool = False,
                 langs: tuple = ("en",), window_tokens: int = 32):
        import ray

        if isinstance(lexicon, (list, tuple)) and len(lexicon) == 1:
            lexicon = lexicon[0]
        if lexicon is None:
            lexicon = build_lexicon()
        elif isinstance(lexicon, ray.ObjectRef):
            lexicon = ray.get(lexicon)
        self.lexicon: Lexicon = lexicon
        self.langs = set(langs) if langs else None
        self.window_tokens = window_tokens
        self.classify_fn = None
        if bucket:
            from lexmapr_ray.lexkit.classify import make_classifier

            self.classify_fn = make_classifier(lexicon)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist() \
            if "lang" in batch.column_names else [None] * len(urls)

        cols = {name: [] for name in FUSED_SCHEMA.names}

        def emit(family, subj, pred, obj, obj_label, mention, status,
                 mention_idx, ctx_before, ctx_after):
            cols["family"].append(family)
            cols["subj"].append(subj)
            cols["pred"].append(pred)
            cols["obj"].append(obj)
            cols["obj_label"].append(obj_label)
            cols["mention"].append(mention)
            cols["status"].append(status)
            cols["mention_idx"].append(mention_idx)
            cols["ctx_before"].append(ctx_before)
            cols["ctx_after"].append(ctx_after)

        bucket = self.classify_fn is not None
        for url, text, lang in zip(urls, texts, langs):
            if self.langs and lang is not None and lang not in self.langs:
                continue
            memo: dict = {}

            def match(mention):
                r = memo.get(mention)
                if r is None:
                    r = memo[mention] = match_sample(
                        mention, self.lexicon, bucket=bucket,
                        classify_fn=self.classify_fn)
                return r

            # family 'triple': MentionMatcher semantics, verbatim
            for mention in segment_mentions(text):
                r = match(mention)
                if not r.matched_components:
                    continue
                p = PRED_FULL if r.macro_status == "Full Term Match" \
                    else PRED_COMPONENT
                status_repr = str(r.micro_status)
                for comp in r.matched_components:
                    label, term_id = comp.rsplit(":", 1)
                    emit("triple", url, p, term_id, label,
                         r.component_surfaces.get(comp, r.cleaned_sample),
                         status_repr, -1, "", "")
                if r.classification:
                    for lab in r.classification["ifsac_final_labels"]:
                        emit("triple", url, PRED_CLASSIFIED, "ifsac:" + lab,
                             lab, r.cleaned_sample, "[]", -1, "", "")

            # family 'ctx': MentionContexts semantics, verbatim
            ms = segment_mention_windows(text, self.window_tokens)
            for i, mention in enumerate(ms):
                r = match(mention)
                if not r.matched_components:
                    continue
                terms = sorted({c.rsplit(":", 1)[1]
                                for c in r.matched_components})
                before = ms[i - 1] if i > 0 else ""
                after = ms[i + 1] if i + 1 < len(ms) else ""
                for t in terms:
                    emit("ctx", url, "", t, "", mention, "", i, before, after)

        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in FUSED_SCHEMA],
            schema=FUSED_SCHEMA,
        )


def extract_text_stage(batch: pa.Table) -> pa.Table:
    """Stateless map_batches fn: html -> text, asserting the per-row
    byte-identical invariant against the shipped ``text`` column.

    Drops ``html`` from the output: the downstream matcher reads only
    (url, text, lang), and the raw html is ~half the bytes crossing the
    object store into the 28-actor pool — the edge where 28 concurrent
    readers contend."""
    htmls = batch["html"].to_pylist()
    texts = [extract_text(h) for h in htmls]
    shipped = batch["text"].to_pylist()
    for t, s in zip(texts, shipped):
        if t != s:
            raise ValueError("extraction invariant violated: extract(html) != text")
    keep = [c for c in ("url", "text", "lang") if c in batch.column_names]
    out = batch.select(keep)
    return out.set_column(out.schema.get_field_index("text"), "text", pa.array(texts))


class MentionMatcher:
    """Actor-pool stage: pages batches in, triples batches out.

    Constructor args may be a plain :class:`Lexicon` (tests) or a
    ``ray.ObjectRef`` from ``ray.put(lexicon)`` (production broadcast).
    """

    def __init__(self, lexicon=None, bucket: bool = False, langs: tuple = ("en",)):
        import ray

        if isinstance(lexicon, (list, tuple)) and len(lexicon) == 1:
            lexicon = lexicon[0]  # broadcast handle wrapped to bypass arg resolution
        if lexicon is None:
            lexicon = build_lexicon()
        elif isinstance(lexicon, ray.ObjectRef):
            lexicon = ray.get(lexicon)
        self.lexicon: Lexicon = lexicon
        self.langs = set(langs) if langs else None
        self.classify_fn = None
        if bucket:
            from lexmapr_ray.lexkit.classify import make_classifier

            self.classify_fn = make_classifier(lexicon)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [None] * len(urls)

        subj, pred, obj, obj_label, mention_col, status_col = [], [], [], [], [], []
        for url, text, lang in zip(urls, texts, langs):
            if self.langs and lang is not None and lang not in self.langs:
                continue
            for mention in segment_mentions(text):
                r = match_sample(
                    mention, self.lexicon, bucket=self.classify_fn is not None,
                    classify_fn=self.classify_fn,
                )
                if not r.matched_components:
                    continue
                p = PRED_FULL if r.macro_status == "Full Term Match" else PRED_COMPONENT
                status_repr = str(r.micro_status)
                for comp in r.matched_components:
                    label, term_id = comp.rsplit(":", 1)
                    subj.append(url)
                    pred.append(p)
                    obj.append(term_id)
                    obj_label.append(label)
                    # the normalized surface chunk that matched — the
                    # canonicalization groupby key (falls back to the whole
                    # cleaned sample for pre-surface-tracking matches)
                    mention_col.append(r.component_surfaces.get(comp, r.cleaned_sample))
                    status_col.append(status_repr)
                if r.classification:
                    for lab in r.classification["ifsac_final_labels"]:
                        subj.append(url)
                        pred.append(PRED_CLASSIFIED)
                        obj.append("ifsac:" + lab)
                        obj_label.append(lab)
                        mention_col.append(r.cleaned_sample)
                        status_col.append("[]")
        return pa.Table.from_arrays(
            [
                pa.array(subj, pa.string()),
                pa.array(pred, pa.string()),
                pa.array(obj, pa.string()),
                pa.array(obj_label, pa.string()),
                pa.array(mention_col, pa.string()),
                pa.array(status_col, pa.string()),
            ],
            schema=TRIPLES_SCHEMA,
        )
