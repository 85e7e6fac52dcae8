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
