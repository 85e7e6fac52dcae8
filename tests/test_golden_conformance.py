"""End-to-end conformance against the reference's committed golden TSVs.

Every input/expected pair from the reference's black-box suite
(``/root/reference/lexmapr/tests/test_pipeline.py:345-428``) is run through
our matcher and compared byte-for-byte.  This is the P/R oracle for the
north rule: exact match on all 28 goldens == P/R 1.0 on the reference's own
corpora.
"""

import os

import pytest

from lexmapr_ray.pipelines.legacy import run_samples
from tests.conftest import REFERENCE_TESTS

# (golden_name, input_name, full, bucket) — mirrors the reference test table.
GOLDEN_CASES = [
    ("empty", "empty.csv", True, False),
    ("empty_not_full", "empty.csv", False, False),
    ("empty_with_tsv_input", "empty_with_tsv_input.tsv", True, False),
    ("empty_not_full_with_tsv_input", "empty_with_tsv_input.tsv", False, False),
    ("empty_buckets", "empty.csv", True, True),
    ("empty_buckets_not_full", "empty.csv", False, True),
    ("empty_buckets_with_tsv_input", "empty_with_tsv_input.tsv", True, True),
    ("empty_buckets_not_full_with_tsv_input", "empty_with_tsv_input.tsv", False, True),
    ("small_simple", "small_simple.csv", True, False),
    ("small_simple_not_full", "small_simple.csv", False, False),
    ("small_simple_with_tsv_input", "small_simple_with_tsv_input.tsv", True, False),
    ("small_simple_not_full_with_tsv_input", "small_simple_with_tsv_input.tsv", False, False),
    ("test_tokenization", "test_tokenization.csv", True, False),
    ("test_preprocessing", "test_preprocessing.csv", True, False),
    ("test_punctuation", "test_punctuation.csv", True, False),
    ("test_extra_inner_spaces", "test_extra_inner_spaces.csv", True, False),
    ("test_spelling_corrections", "test_spelling_corrections.csv", True, False),
    ("test_abbreviations", "test_abbreviations.csv", True, False),
    ("test_non_english_words", "test_non_english_words.csv", True, False),
    ("test_stop_word_handling", "test_stop_word_handling.csv", True, False),
    ("test_candidate_phrase", "test_candidate_phrase.csv", True, False),
    ("test_full_term_dir_match", "test_full_term_dir_match.csv", True, False),
    ("test_full_term_coc_match", "test_full_term_coc_match.csv", True, False),
    ("test_full_term_perm_match", "test_full_term_perm_match.csv", True, False),
    ("test_full_term_sfx_match", "test_full_term_sfx_match.csv", True, False),
    ("test_full_term_wiki_match", "test_full_term_wiki_match.csv", True, False),
    ("test_sample_id_only", "test_sample_id_only.csv", True, False),
    ("test_pluralization", "test_pluralization.csv", True, False),
]


@pytest.mark.parametrize("golden,inp,full,bucket", GOLDEN_CASES,
                         ids=[c[0] for c in GOLDEN_CASES])
def test_golden(golden, inp, full, bucket, lexicon):
    with open(os.path.join(REFERENCE_TESTS, "test_output", golden + ".tsv")) as fp:
        expected = fp.read()
    got = run_samples(
        os.path.join(REFERENCE_TESTS, "test_input", inp),
        lexicon=lexicon, full=full, bucket=bucket,
    )
    assert got == expected
