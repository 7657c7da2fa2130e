"""Dictionary helpers.

Capability parity with the reference's ``speechbrain/utils/dictionaries``
(synonym dictionaries for weighted WER costs).
"""


class SynonymDictionary:
    """Groups of words considered equivalent for scoring.

    Example
    -------
    >>> syn = SynonymDictionary()
    >>> syn.add_synonym_group(["ok", "okay"])
    >>> syn("ok", "okay")
    True
    >>> syn("ok", "no")
    False
    """

    def __init__(self):
        self.synonyms = {}
        self._next_group = 0

    def add_synonym_group(self, words):
        group = self._next_group
        self._next_group += 1
        for w in words:
            self.synonyms.setdefault(w, set()).add(group)

    @classmethod
    def from_json_file(cls, path):
        import json

        with open(path, encoding="utf-8") as f:
            groups = json.load(f)
        d = cls()
        for g in groups:
            d.add_synonym_group(g)
        return d

    def __call__(self, a, b):
        if a == b:
            return True
        return bool(self.synonyms.get(a, set()) & self.synonyms.get(b, set()))
