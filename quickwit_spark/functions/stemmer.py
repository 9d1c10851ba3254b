"""English Snowball stemmer (Porter2) — the ``stem_en`` tokenizer option of
the reference (quickwit-doc-mapper config surface,
field_mapping_entry.rs:604-610; tantivy applies rust-stemmers'
Algorithm::English, i.e. the published Snowball "english" algorithm).

Re-implemented natively from the public algorithm description
(snowballstem.org "The English (Porter2) stemming algorithm").  Applied at
index-build time to every emitted token of a ``stem_en`` field and at
parse-bind time to query terms, so both sides agree — exactly how tantivy's
TextAnalyzer applies the same filter chain to documents and queries.

Stemming is 1:1 per token: positions and per-doc token counts (the BM25
field length / fieldnorm analog) are unchanged by design.

The hot path stems only the *unique* terms of a chunk (`stem_factorized`),
never the token stream: a transcript chunk has ~100x more tokens than
distinct terms, and the per-unique work is dict-cached across chunks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDINGS = frozenset("cdeghkmnrt")

# exceptional forms, applied before the algorithm
_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
# invariant after step 1a
_EXCEPTION2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring", "proceed",
     "exceed", "succeed")
)

_STEP2 = (
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", None), ("li", None),  # ogi/li: special rules
)

_STEP3 = (
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"), ("icate", "ic"),
    ("iciti", "ic"), ("ative", None), ("ical", "ic"), ("ness", ""), ("ful", ""),
)

_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ism",
    "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
)


def _regions(word: str) -> tuple[int, int]:
    """R1 = after the first non-vowel following a vowel (special-cased for
    gener/commun/arsen prefixes); R2 = the same, computed within R1."""
    n = len(word)

    def scan(start: int) -> int:
        for i in range(start, n - 1):
            if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
                return i + 2
        return n

    r1 = None
    for p in ("gener", "commun", "arsen"):
        if word.startswith(p):
            r1 = len(p)
            break
    if r1 is None:
        r1 = scan(0)
    return r1, scan(r1)


def _ends_short_syllable(word: str) -> bool:
    n = len(word)
    if n == 2:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    if n >= 3:
        return (
            word[-2] in _VOWELS
            and word[-1] not in _VOWELS
            and word[-1] not in "wxY"
            and word[-3] not in _VOWELS
        )
    return False


def _has_vowel(part: str) -> bool:
    return any(c in _VOWELS for c in part)


def stem(word: str) -> str:
    """Snowball English stem of a single lowercase token."""
    if len(word) <= 2:
        return word
    if word[0] == "'":
        word = word[1:]
    if word in _EXCEPTION1:
        return _EXCEPTION1[word]

    # mark consonant-y as Y (initial y, or y after a vowel)
    if "y" in word:
        chars = list(word)
        if chars[0] == "y":
            chars[0] = "Y"
        for i in range(1, len(chars)):
            if chars[i] == "y" and chars[i - 1] in _VOWELS:
                chars[i] = "Y"
        word = "".join(chars)

    r1, r2 = _regions(word)

    # step 0: strip apostrophe suffixes
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s") and _has_vowel(word[:-2]):
        word = word[:-1]

    if word in _EXCEPTION2:
        return word

    # step 1b
    if word.endswith("eedly"):
        if len(word) - 5 >= r1:
            word = word[:-3]
    elif word.endswith("eed"):
        if len(word) - 3 >= r1:
            word = word[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                part = word[: -len(suf)]
                if _has_vowel(part):
                    word = part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif r1 >= len(word) and _ends_short_syllable(word):
                        word += "e"
                break

    # step 1c: y/Y -> i after a non-vowel that is not the first letter
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _VOWELS:
        word = word[:-1] + "i"

    # step 2 (longest-suffix semantics: the longest match decides, even if
    # its region test then fails)
    for suf, rep in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if len(word) >= 4 and word[-4] == "l":
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_ENDINGS:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - 5 >= r2:
                        word = word[:-5]
                else:
                    word = word[: -len(suf)] + rep
            break

    # step 4
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # step 5
    if word.endswith("e"):
        pos = len(word) - 1
        if pos >= r2 or (pos >= r1 and not _ends_short_syllable(word[:-1])):
            word = word[:-1]
    elif word.endswith("l") and len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
        word = word[:-1]

    return word.replace("Y", "y")


# -- vectorized surfaces ------------------------------------------------------

_CACHE: dict[str, str] = {}
_CACHE_CAP = 1 << 20


def stem_cached(word: str) -> str:
    s = _CACHE.get(word)
    if s is None:
        s = stem(word)
        if len(_CACHE) >= _CACHE_CAP:
            _CACHE.clear()
        _CACHE[word] = s
    return s


def stem_factorized(flat_terms: np.ndarray) -> np.ndarray:
    """Stem a flat token array by stemming only its unique values — the
    vectorized build-side path (tokens >> distinct terms in transcripts)."""
    if len(flat_terms) == 0:
        return flat_terms
    codes, uniques = pd.factorize(flat_terms)
    stemmed = np.array([stem_cached(u) for u in uniques], dtype=object)
    return stemmed[codes]


def stem_token_lists(token_lists: pd.Series) -> pd.Series:
    """Stem Series[list[str]] element-wise (oracle/test helper)."""
    return token_lists.map(lambda toks: [stem_cached(t) for t in toks])
