"""TTS text cleaning and symbol-sequence conversion.

Capability parity with the reference's
``speechbrain/utils/text_to_sequence.py`` (english_cleaners,
text_to_sequence, _symbols): number/abbreviation expansion, whitespace
collapse, char-to-id mapping with the standard Tacotron symbol table.
"""

import re

_pad = "_"
_punctuation = "!'(),.:;? "
_special = "-"
_letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

symbols = [_pad] + list(_special) + list(_punctuation) + list(_letters)
_symbol_to_id = {s: i for i, s in enumerate(symbols)}
_id_to_symbol = {i: s for i, s in enumerate(symbols)}

_abbreviations = [
    (re.compile(rf"\b{abbr}\.", re.IGNORECASE), full)
    for abbr, full in [
        ("mrs", "misess"), ("mr", "mister"), ("dr", "doctor"),
        ("st", "saint"), ("co", "company"), ("jr", "junior"),
        ("maj", "major"), ("gen", "general"), ("drs", "doctors"),
        ("rev", "reverend"), ("lt", "lieutenant"), ("hon", "honorable"),
        ("sgt", "sergeant"), ("capt", "captain"), ("esq", "esquire"),
        ("ltd", "limited"), ("col", "colonel"), ("ft", "fort"),
    ]
]

_whitespace_re = re.compile(r"\s+")

_units = ["", "one", "two", "three", "four", "five", "six", "seven",
          "eight", "nine", "ten", "eleven", "twelve", "thirteen",
          "fourteen", "fifteen", "sixteen", "seventeen", "eighteen",
          "nineteen"]
_tens = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]


def _num_to_words(n):
    if n < 0:
        return "minus " + _num_to_words(-n)
    if n < 20:
        return _units[n] or "zero"
    if n < 100:
        return (_tens[n // 10] + (" " + _units[n % 10] if n % 10 else "")).strip()
    if n < 1000:
        rest = n % 100
        return (_units[n // 100] + " hundred"
                + (" " + _num_to_words(rest) if rest else ""))
    for scale, name in ((10**9, "billion"), (10**6, "million"), (10**3, "thousand")):
        if n >= scale:
            rest = n % scale
            return (_num_to_words(n // scale) + " " + name
                    + (" " + _num_to_words(rest) if rest else ""))
    return str(n)


def expand_numbers(text):
    """Replace integer literals with words.

    Example
    -------
    >>> expand_numbers("I have 21 cats")
    'I have twenty one cats'
    """
    return re.sub(r"\d+", lambda m: _num_to_words(int(m.group(0))), text)


def expand_abbreviations(text):
    """Expand common English abbreviations (mrs. -> misess, ...)."""
    for pattern, replacement in _abbreviations:
        text = pattern.sub(replacement, text)
    return text


def lowercase(text):
    """Lowercase the text."""
    return text.lower()


def collapse_whitespace(text):
    """Collapse whitespace runs into single spaces."""
    return _whitespace_re.sub(" ", text)


def basic_cleaners(text):
    """Lowercase + whitespace collapse."""
    return collapse_whitespace(lowercase(text))


def transliteration_cleaners(text):
    """Pipeline for non-English text: lowercase + whitespace collapse."""
    return basic_cleaners(text)


def english_cleaners(text):
    """The standard english pipeline (reference text_to_sequence.py).

    Example
    -------
    >>> english_cleaners("Dr. Smith has 2 dogs!")
    'doctor smith has two dogs!'
    """
    text = expand_abbreviations(text)
    text = expand_numbers(text)
    return collapse_whitespace(lowercase(text))


_CLEANERS = {
    "basic_cleaners": basic_cleaners,
    "english_cleaners": english_cleaners,
    "transliteration_cleaners": transliteration_cleaners,
}


def text_to_sequence(text, cleaner_names=("english_cleaners",)):
    """Text -> list of symbol ids.

    Example
    -------
    >>> seq = text_to_sequence("Hi!")
    >>> sequence_to_text(seq)
    'hi!'
    """
    for name in cleaner_names:
        text = _CLEANERS[name](text)
    return [_symbol_to_id[ch] for ch in text if ch in _symbol_to_id]


def sequence_to_text(sequence):
    """Inverse mapping for debugging."""
    return "".join(_id_to_symbol.get(int(i), "") for i in sequence)
