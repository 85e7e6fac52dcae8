"""Text normalization primitives.

Self-contained clones of the third-party text routines the reference relies
on (Penn-Treebank word tokenizer / detokenizer from NLTK, which is not
installed here), plus re-implementations of the reference's own small string
helpers.  Semantics are pinned by the reference's committed golden outputs.

Reference citations (``/root/reference``):
 - punctuation_treatment: lexmapr/pipeline_helpers.py:293-308
 - preprocess:            lexmapr/pipeline_helpers.py:276-290
 - is_number / is_date:   lexmapr/pipeline_helpers.py:198-231
 - ngrams:                lexmapr/pipeline_helpers.py:234-249
 - tokenizer semantics:   nltk.word_tokenize as used at lexmapr/pipeline.py:129
 - detokenizer semantics: nltk TreebankWordDetokenizer as used at
                          lexmapr/pipeline_helpers.py:163
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

from dateutil.parser import parse as _parse_date

_PUNCT_CLASS = re.compile(r"[-_();/:%,]")


def punctuation_treatment(term: str) -> str:
    """Replace ``- _ ( ) ; / : % ,`` with spaces and collapse whitespace."""
    return " ".join(_PUNCT_CLASS.sub(" ", term).split())


def preprocess(token: str) -> str:
    """Drop possessives, rightmost comma and rightmost period from a token."""
    return token.replace("'s", "").rstrip("', ").rstrip(". ")


@lru_cache(maxsize=1 << 17)
def is_number(s: str) -> bool:
    """True if *s* parses as a float or a unicode numeric character."""
    try:
        float(s)
        return True
    except ValueError:
        pass
    try:
        unicodedata.numeric(s)
        return True
    except (TypeError, ValueError):
        pass
    return False


@lru_cache(maxsize=1 << 17)
def is_date(s: str) -> bool:
    """True if *s* parses as a date/day (permissive dateutil parse)."""
    try:
        _parse_date(s)
        return True
    except (ValueError, OverflowError):
        return False


def ngrams(text: str, gram_value: int) -> list[list[str]]:
    """Contiguous token n-grams of a space-separated string."""
    tokens = text.split(" ")
    return [tokens[i:i + gram_value] for i in range(len(tokens) - gram_value + 1)]


# ---------------------------------------------------------------------------
# Penn-Treebank-style word tokenizer (public rule set).
# ---------------------------------------------------------------------------

_STARTING_QUOTES = [
    (re.compile(r"^\""), r"``"),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
]

_PUNCTUATION = [
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    # sentence-final period (plus trailing closers/quotes)
    (re.compile(r"([^\.])(\.)([\]\)}>\"\']*)\s*$"), r"\1 \2\3 "),
    # period at an internal sentence boundary ("word. next") — stands in for
    # the punkt sentence split the reference gets from nltk.word_tokenize
    (re.compile(r"([^\.\s])(\.)(\s)"), r"\1 \2\3"),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]

_PARENS_BRACKETS = [
    (re.compile(r"[\]\[\(\)\{\}\<\>]"), r" \g<0> "),
    (re.compile(r"--"), r" -- "),
]

_ENDING_QUOTES = [
    (re.compile(r"\""), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]

_CONTRACTIONS = [
    re.compile(r"(?i)\b(can)(?#X)(not)\b"),
    re.compile(r"(?i)\b(d)(?#X)('ye)\b"),
    re.compile(r"(?i)\b(gim)(?#X)(me)\b"),
    re.compile(r"(?i)\b(gon)(?#X)(na)\b"),
    re.compile(r"(?i)\b(got)(?#X)(ta)\b"),
    re.compile(r"(?i)\b(lem)(?#X)(me)\b"),
    re.compile(r"(?i)\b(mor)(?#X)('n)\b"),
    re.compile(r"(?i)\b(wan)(?#X)(na)\s"),
]

_CONTRACTIONS3 = [
    re.compile(r"(?i) ('t)(?#X)(is)\b"),
    re.compile(r"(?i) ('t)(?#X)(was)\b"),
]


_PLAIN_TEXT = re.compile(r"[a-z0-9 ]*\Z")


def word_tokenize(text: str) -> list[str]:
    """Tokenize *text* with Treebank-style rules.

    Matches the behavior of ``nltk.word_tokenize`` on the post-punctuation
    character set the reference feeds it (lowercased text containing letters,
    digits, periods and apostrophes; commas only via lexicon substitutions).
    """
    # fast path: on plain lowercase alphanumerics every Treebank rule is an
    # identity, and ~100 regex subs per call dominate the matcher profile
    if _PLAIN_TEXT.match(text):
        return text.split()
    for regexp, substitution in _STARTING_QUOTES:
        text = regexp.sub(substitution, text)
    for regexp, substitution in _PUNCTUATION:
        text = regexp.sub(substitution, text)
    for regexp, substitution in _PARENS_BRACKETS:
        text = regexp.sub(substitution, text)
    text = " " + text + " "
    for regexp, substitution in _ENDING_QUOTES:
        text = regexp.sub(substitution, text)
    for regexp in _CONTRACTIONS:
        text = regexp.sub(r" \1 \2 ", text)
    for regexp in _CONTRACTIONS3:
        text = regexp.sub(r" \1 \2 ", text)
    return text.split()


# ---------------------------------------------------------------------------
# Treebank detokenizer (subset of the public rule set that is reachable from
# the strings the reference pipeline detokenizes: space-joined lemma lists).
# ---------------------------------------------------------------------------

_DETOK_RULES = [
    # standalone punctuation re-attaches leftward
    (re.compile(r" ([.,:;?!%]+)([ \'\"`])"), r"\1\2"),
    (re.compile(r" ([.,:;?!%]+)$"), r"\1"),
    # brackets re-attach inward
    (re.compile(r"([\[\(\{\<]) "), r"\g<1>"),
    (re.compile(r" ([\]\)\}\>])"), r"\g<1>"),
    (re.compile(r"([\]\)\}\>]) ([:;,.])"), r"\1\2"),
    # possessives / contractions re-attach leftward
    (re.compile(r"([^' ]) ('[sS]|'[mM]|'[dD]|'ll|'LL|'re|'RE|'ve|'VE|n't|N'T)\b"), r"\1\2"),
]


def detokenize(tokens: list[str]) -> str:
    """Join *tokens* Treebank-style (inverse of :func:`word_tokenize`)."""
    text = " ".join(tokens)
    # fast path: with no punctuation characters at all, every detok rule is
    # an identity — the 6 regex subs per call dominated the matcher profile
    if _PLAIN_TEXT.match(text):
        return text
    for regexp, substitution in _DETOK_RULES:
        text = regexp.sub(substitution, text)
    return text


def remove_duplicate_tokens(input_string: str) -> str:
    """Order-preserving dedup of space-separated tokens, then detokenize.

    Restores the one whitelisted duplicate ("gallus gallus"), mirroring
    lexmapr/pipeline_helpers.py:150-172.
    """
    seen = list(dict.fromkeys(input_string.split(" ")))
    refined = detokenize(seen).strip()
    if "gallus gallus" in input_string and "gallus gallus" not in refined:
        refined = refined.replace("gallus", "gallus gallus")
    return refined
