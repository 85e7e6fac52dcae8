"""Legacy LexMapr-compatible CSV->TSV runner (conformance surface).

Byte-compatible re-implementation of the reference's input/output contract
(``/root/reference/lexmapr/pipeline.py:62-107, 279-297``): CSV/TSV sample
files in, tab-separated report out, including the reference's quirky
serialization (Python ``str()`` repr for list/dict cells, newline-prefixed
rows, trailing newline).  Used by the conformance tests that compare against
the reference's committed golden TSVs; the web-scale path lives in
:mod:`lexmapr_ray.pipelines.kg`.
"""

from __future__ import annotations

import csv
import io
import os

from lexmapr_ray.lexkit.lexicon import Lexicon, build_lexicon
from lexmapr_ray.lexkit.matcher import match_sample

OUTPUT_FIELDS_BASE = [
    "Sample_Id",
    "Sample_Desc",
    "Processed_Sample",
    "Processed_Sample (With Scientific Name)",
    "Matched_Components",
]
FULL_FIELDS = ["Match_Status(Macro Level)", "Match_Status(Micro Level)", "Sample_Transformations"]
NOT_FULL_FIELDS = ["Match_Status(Macro Level)"]
BUCKET_FULL_FIELDS = [
    "LexMapr Classification (Full List)",
    "LexMapr Bucket",
    "Third Party Bucket",
    "Third Party Classification",
]
BUCKET_NOT_FULL_FIELDS = ["Third Party Classification"]


def iter_sample_rows(input_path: str):
    """Yield ``(sample_id, sample_text)`` rows from a CSV/TSV sample file.

    Mirrors pipeline.py:97-112: delimiter by extension, header skipped,
    columns after the first joined with spaces.
    """
    _, ext = os.path.splitext(input_path)
    if ext == ".csv":
        delimiter = ","
    elif ext == ".tsv":
        delimiter = "\t"
    else:
        raise ValueError("Should not reach here")
    with open(input_path, newline="") as fr:
        reader = csv.reader(fr, delimiter=delimiter)
        next(reader)
        for row in reader:
            yield row[0].strip(), " ".join(row[1:]).strip()


def build_legacy_lexicon(
    *,
    config: str | None = None,
    no_cache: bool = False,
    bucket: bool = False,
    resolve=None,
) -> Lexicon:
    """Reference pipeline.py:28-54 resource assembly for the legacy CLI:
    predefined resources (+classification tables when ``bucket``), then —
    when a ``--config`` ontology JSON is given — the fetched ontology
    lookup table merged in, ontology side winning, honoring ``--no-cache``
    (reference get_config_resources(path, no_cache),
    pipeline_resources.py:74-101)."""
    import tempfile

    from lexmapr_ray.lexkit.lexicon import (build_lexicon,
                                            merge_config_into_lexicon)

    lexicon = build_lexicon(classification=bucket)
    if config:
        # per-config JSON cache, keyed by config basename like the
        # reference (pipeline_resources.py:95-101); LEXMAPR_RAY_CACHE_DIR
        # overrides the default tmp location.  --no-cache rebuilds and
        # replaces the cached table (review r5: the flag was a no-op
        # because no cache_dir was ever passed).
        cache_dir = os.environ.get(
            "LEXMAPR_RAY_CACHE_DIR",
            os.path.join(tempfile.gettempdir(), "lexmapr_ray_onto_cache"))
        lexicon = merge_config_into_lexicon(
            lexicon, config, no_cache=no_cache, resolve=resolve,
            cache_dir=cache_dir)
    return lexicon


def run_samples(
    input_path: str,
    *,
    lexicon: Lexicon | None = None,
    full: bool = True,
    bucket: bool = False,
) -> str:
    """Run the matcher over a legacy sample file; return the report TSV."""
    if lexicon is None:
        lexicon = build_lexicon(classification=bucket)

    classify_fn = None
    if bucket:
        from lexmapr_ray.lexkit.classify import make_classifier

        classify_fn = make_classifier(lexicon)

    fields = list(OUTPUT_FIELDS_BASE)
    fields += FULL_FIELDS if full else NOT_FULL_FIELDS
    if bucket:
        fields += BUCKET_FULL_FIELDS if full else BUCKET_NOT_FULL_FIELDS

    fw = io.StringIO()
    fw.write("\t".join(fields))
    for sample_id, original_sample in iter_sample_rows(input_path):
        r = match_sample(original_sample, lexicon, bucket=bucket, classify_fn=classify_fn)
        fw.write(
            "\n" + sample_id + "\t" + original_sample + "\t" + r.cleaned_sample + "\t"
            + r.scientific_name_sample + "\t" + str(r.matched_components) + "\t"
            + r.macro_status
        )
        if full:
            fw.write("\t" + str(r.micro_status) + "\t" + str(r.conversions))
        if bucket:
            c = r.classification or {
                "lexmapr_hierarchy_buckets": [],
                "lexmapr_final_buckets": [],
                "ifsac_final_buckets": [],
                "ifsac_final_labels": [],
            }
            if full:
                fw.write(
                    "\t" + str(c["lexmapr_hierarchy_buckets"])
                    + "\t" + str(c["lexmapr_final_buckets"])
                    + "\t" + str(c["ifsac_final_buckets"])
                )
            fw.write("\t" + str(c["ifsac_final_labels"]))
    fw.write("\n")
    return fw.getvalue()


def _format_report_rows(rows: list[dict], *, full: bool, bucket: bool) -> str:
    """Serialize matched rows in the reference's byte format (shared by the
    serial and distributed paths)."""
    fields = list(OUTPUT_FIELDS_BASE)
    fields += FULL_FIELDS if full else NOT_FULL_FIELDS
    if bucket:
        fields += BUCKET_FULL_FIELDS if full else BUCKET_NOT_FULL_FIELDS
    out = ["\t".join(fields)]
    for r in rows:
        line = (
            "\n" + r["sample_id"] + "\t" + r["sample"] + "\t" + r["cleaned"] + "\t"
            + r["sc_name"] + "\t" + r["components"] + "\t" + r["macro"]
        )
        if full:
            line += "\t" + r["micro"] + "\t" + r["conversions"]
        if bucket:
            if full:
                line += ("\t" + r["lexmapr_hier"] + "\t" + r["lexmapr_final"]
                         + "\t" + r["ifsac_final"])
            line += "\t" + r["ifsac_labels"]
        out.append(line)
    out.append("\n")
    return "".join(out)


class SampleMatcher:
    """Actor-pool stage for the legacy surface: sample rows in, fully
    serialized per-sample report fields out (everything the TSV needs).

    Same broadcast-lexicon pattern as the KG MentionMatcher."""

    def __init__(self, lexicon=None, bucket: bool = False):
        import ray

        if isinstance(lexicon, (list, tuple)) and len(lexicon) == 1:
            lexicon = lexicon[0]
        if lexicon is None:
            lexicon = build_lexicon(classification=bucket)
        elif isinstance(lexicon, ray.ObjectRef):
            lexicon = ray.get(lexicon)
        self.lexicon = lexicon
        self.classify_fn = None
        if bucket:
            from lexmapr_ray.lexkit.classify import make_classifier

            self.classify_fn = make_classifier(lexicon)

    def __call__(self, batch):
        import pyarrow as pa

        idxs = batch["idx"].to_pylist()
        ids = batch["sample_id"].to_pylist()
        samples = batch["sample"].to_pylist()
        cols = {k: [] for k in (
            "cleaned", "sc_name", "components", "macro", "micro", "conversions",
            "lexmapr_hier", "lexmapr_final", "ifsac_final", "ifsac_labels")}
        for s in samples:
            r = match_sample(s, self.lexicon, bucket=self.classify_fn is not None,
                             classify_fn=self.classify_fn)
            cols["cleaned"].append(r.cleaned_sample)
            cols["sc_name"].append(r.scientific_name_sample)
            cols["components"].append(str(r.matched_components))
            cols["macro"].append(r.macro_status)
            cols["micro"].append(str(r.micro_status))
            cols["conversions"].append(str(r.conversions))
            c = r.classification or {
                "lexmapr_hierarchy_buckets": [], "lexmapr_final_buckets": [],
                "ifsac_final_buckets": [], "ifsac_final_labels": [],
            }
            cols["lexmapr_hier"].append(str(c["lexmapr_hierarchy_buckets"]))
            cols["lexmapr_final"].append(str(c["lexmapr_final_buckets"]))
            cols["ifsac_final"].append(str(c["ifsac_final_buckets"]))
            cols["ifsac_labels"].append(str(c["ifsac_final_labels"]))
        arrays = {"idx": pa.array(idxs, pa.int64()),
                  "sample_id": pa.array(ids, pa.string()),
                  "sample": pa.array(samples, pa.string())}
        arrays.update({k: pa.array(v, pa.string()) for k, v in cols.items()})
        return pa.table(arrays)


def run_samples_distributed(
    input_path: str,
    *,
    lexicon: Lexicon | None = None,
    full: bool = True,
    bucket: bool = False,
    batch_size: int = 256,
    concurrency=None,
) -> str:
    """Distributed legacy run: byte-identical report to :func:`run_samples`.

    Rows are tagged with their input index, matched in the actor pool, then
    globally sorted back to input order (the reference's output preserves
    file order; a ``sort`` is how a distributed engine restores it)."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    if lexicon is None:
        lexicon = build_lexicon(classification=bucket)
    lexicon_ref = ray.put(lexicon)
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)

    rows = list(iter_sample_rows(input_path))
    table = pa.table({
        "idx": pa.array(range(len(rows)), pa.int64()),
        "sample_id": pa.array([r[0] for r in rows], pa.string()),
        "sample": pa.array([r[1] for r in rows], pa.string()),
    })
    ds = rd.from_arrow(table)
    matched = ds.map_batches(
        SampleMatcher,
        fn_constructor_kwargs={"lexicon": [lexicon_ref], "bucket": bucket},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    out_rows = matched.sort("idx").to_pandas().to_dict("records")
    return _format_report_rows(out_rows, full=full, bucket=bucket)
