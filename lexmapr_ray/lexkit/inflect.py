"""Rails-style English singularizer.

Self-contained re-implementation of the public Rails/ActiveSupport
singularization algorithm (the same rule table used by the ``inflection``
PyPI package, which the reference imports at
``/root/reference/lexmapr/pipeline_helpers.py:8`` but which is not installed
in this environment).  The rule list is ordered; the first matching rule
wins.  Verified against the reference's committed golden outputs
(e.g. ``potatoes -> potato``, ``does -> do``, ``epiphysis -> epiphysi``,
``as -> a``, ``news -> news``).
"""

from __future__ import annotations

import re
from functools import lru_cache

# Ordered (pattern, replacement) rules.  Irregulars first, then the general
# suffix rules.  All patterns are case-insensitive and anchored at the end.
_SINGULAR_RULES: list[tuple[str, str]] = [
    # irregulars (singular, plural) pairs registered last win the front slot;
    # listed here already in effective probe order.
    (r"(?i)(z)ombies$", r"\1ombie"),
    (r"(?i)k[iI][nN][eE]$", r"cow"),
    (r"(?i)(m)oves$", r"\1ove"),
    (r"(?i)(s)exes$", r"\1ex"),
    (r"(?i)(c)hildren$", r"\1hild"),
    (r"(?i)(h)umans$", r"\1uman"),
    (r"(?i)(m)en$", r"\1an"),
    (r"(?i)(p)eople$", r"\1erson"),
    # general rules
    (r"(?i)(database)s$", r"\1"),
    (r"(?i)(quiz)zes$", r"\1"),
    (r"(?i)(matr)ices$", r"\1ix"),
    (r"(?i)(vert|ind)ices$", r"\1ex"),
    (r"(?i)^(ox)en", r"\1"),
    (r"(?i)(alias|status)(es)?$", r"\1"),
    (r"(?i)(octop|vir)(us|i)$", r"\1us"),
    (r"(?i)^(a)x[ie]s$", r"\1xis"),
    (r"(?i)(cris|test)(is|es)$", r"\1is"),
    (r"(?i)(shoe)s$", r"\1"),
    (r"(?i)(o)es$", r"\1"),
    (r"(?i)(bus)(es)?$", r"\1"),
    (r"(?i)(m|l)ice$", r"\1ouse"),
    (r"(?i)(x|ch|ss|sh)es$", r"\1"),
    (r"(?i)(m)ovies$", r"\1ovie"),
    (r"(?i)(s)eries$", r"\1eries"),
    (r"(?i)([^aeiouy]|qu)ies$", r"\1y"),
    (r"(?i)([lr])ves$", r"\1f"),
    (r"(?i)(tive)s$", r"\1"),
    (r"(?i)(hive)s$", r"\1"),
    (r"(?i)([^f])ves$", r"\1fe"),
    (r"(?i)(t)he(sis|ses)$", r"\1hesis"),
    (r"(?i)(s)ynop(sis|ses)$", r"\1ynopsis"),
    (r"(?i)(p)rogno(sis|ses)$", r"\1rognosis"),
    (r"(?i)(p)arenthe(sis|ses)$", r"\1arenthesis"),
    (r"(?i)(d)iagno(sis|ses)$", r"\1iagnosis"),
    (r"(?i)(b)a(sis|ses)$", r"\1asis"),
    (r"(?i)(a)naly(sis|ses)$", r"\1nalysis"),
    (r"(?i)([ti])a$", r"\1um"),
    (r"(?i)(n)ews$", r"\1ews"),
    (r"(?i)(ss)$", r"\1"),
    (r"(?i)s$", r""),
]

_COMPILED_RULES = [(re.compile(p), r) for p, r in _SINGULAR_RULES]

_UNCOUNTABLE_RE = re.compile(
    r"(?i)\b(equipment|fish|information|jeans|money|rice|series|sheep|species)\Z"
)


@lru_cache(maxsize=1 << 17)
def singularize(word: str) -> str:
    """Return the singular form of an English *word*.

    First-matching-rule-wins over the ordered rule table; words ending in an
    uncountable noun are returned unchanged.
    """
    if _UNCOUNTABLE_RE.search(word):
        return word
    for rule, replacement in _COMPILED_RULES:
        if rule.search(word):
            return rule.sub(replacement, word)
    return word
