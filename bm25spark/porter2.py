"""Porter2 (Snowball English) stemmer, pure Python.

Implements the published Snowball "english" algorithm
(https://snowballstem.org/algorithms/english/stemmer.html), which is
what PostgreSQL's `english` text-search dictionary uses. The reference
engine never stems — tokenization is external to it (see
/root/reference/README.md:126-139 and tests/sqllogictest/*.slt which
all use `to_tsvector('english', ...)`) — so this module exists to
reproduce the reference's golden test corpora, not its code.
"""

from __future__ import annotations

VOWELS = set("aeiouy")
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
LI_ENDING = set("cdeghkmnrt")

_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTIONS2 = {
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
}

_STEP2 = [
    ("ization", "ize"), ("ational", "ate"), ("ousness", "ous"),
    ("iveness", "ive"), ("fulness", "ful"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"),
]

_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
]

_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
]


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in VOWELS


def _regions(word: str) -> tuple[int, int]:
    n = len(word)
    r1 = n
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            r1 = len(prefix)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        c1, v, c2 = word[-3], word[-2], word[-1]
        return (
            v in VOWELS
            and c2 not in VOWELS
            and c2 not in "wxY"
            and c1 not in VOWELS
        )
    return False


def stem(word: str) -> str:
    """Stem a lowercase word with the Snowball English algorithm."""
    if len(word) <= 2:
        return word
    word = word.replace("’", "'")
    if word.startswith("'"):
        word = word[1:]
    if word in _EXCEPTIONS1:
        return _EXCEPTIONS1[word]

    # mark consonant-y as Y
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _regions(word.lower())

    def in_r1(w: str, suffix_len: int) -> bool:
        return len(w) - suffix_len >= r1

    def in_r2(w: str, suffix_len: int) -> bool:
        return len(w) - suffix_len >= r2

    # Step 0
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if any(c in VOWELS for c in word[:-2].lower()):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word

    # Step 1b
    low = word.lower()
    if low.endswith(("eed", "eedly")):
        suf = "eedly" if low.endswith("eedly") else "eed"
        if in_r1(word, len(suf)):
            word = word[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if low.endswith(suf):
                stem_part = word[: -len(suf)]
                if any(c in VOWELS for c in stem_part.lower()):
                    word = stem_part
                    lw = word.lower()
                    if lw.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif lw.endswith(DOUBLES):
                        word = word[:-1]
                    elif len(word) == r1 and _ends_short_syllable(lw):
                        word += "e"
                break

    # Step 1c
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2].lower() not in VOWELS
    ):
        word = word[:-1] + "i"

    # Step 2
    low = word.lower()
    for suf, repl in _STEP2:
        if low.endswith(suf):
            if in_r1(word, len(suf)):
                word = word[: -len(suf)] + repl
            break
    else:
        if low.endswith("ogi"):
            if in_r1(word, 3) and len(word) >= 4 and word[-4].lower() == "l":
                word = word[:-1]
        elif low.endswith("li"):
            if in_r1(word, 2) and len(word) >= 3 and word[-3].lower() in LI_ENDING:
                word = word[:-2]

    # Step 3
    low = word.lower()
    for suf, repl in _STEP3:
        if low.endswith(suf):
            if in_r1(word, len(suf)):
                word = word[: -len(suf)] + repl
            break
    else:
        if low.endswith("ative") and in_r2(word, 5):
            word = word[:-5]

    # Step 4
    low = word.lower()
    for suf in _STEP4:
        if low.endswith(suf):
            if in_r2(word, len(suf)):
                if suf == "ion":
                    if len(word) > 3 and word[-4].lower() in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5
    low = word.lower()
    if low.endswith("e"):
        if in_r2(word, 1) or (
            in_r1(word, 1) and not _ends_short_syllable(low[:-1])
        ):
            word = word[:-1]
    elif low.endswith("l"):
        if in_r2(word, 1) and len(word) >= 2 and word[-2].lower() == "l":
            word = word[:-1]

    return word.replace("Y", "y")
