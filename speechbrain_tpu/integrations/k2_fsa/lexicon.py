"""Unit-based lexicon: words -> token id sequences.

Capability parity with the reference's
``speechbrain/integrations/k2_fsa/lexicon.py`` (Lexicon at lexicon.py:42,
prepare_char_lexicon at :415, read_lexicon at :527, write_lexicon at
:569), without the k2 dependency: symbol tables are plain dicts and the
L FST is the arc-list text written by :mod:`.prepare_lang`.
"""

import csv
import re
from pathlib import Path

EPS = "<eps>"


def read_lexicon(filename):
    """Read ``word p1 p2 ...`` lines -> [(word, [tokens])]
    (reference lexicon.py:527)."""
    ans = []
    ws = re.compile("[ \t]+")
    with open(filename, encoding="utf-8") as f:
        for line in f:
            a = ws.split(line.strip(" \t\r\n"))
            if not a or a == [""]:
                continue
            if len(a) < 2:
                raise RuntimeError(
                    f"Bad lexicon line {line!r} in {filename}: every line "
                    "needs at least 2 fields"
                )
            if a[0] == EPS:
                raise RuntimeError(f"{EPS} is not a valid word ({filename})")
            ans.append((a[0], a[1:]))
    return ans


def write_lexicon(filename, lexicon):
    """Inverse of :func:`read_lexicon` (reference lexicon.py:569)."""
    with open(filename, "w", encoding="utf-8") as f:
        for word, tokens in lexicon:
            f.write(f"{word} {' '.join(tokens)}\n")


def read_symbol_table(filename):
    """Read a ``symbol id`` table into a dict."""
    table = {}
    with open(filename, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) == 2:
                table[parts[0]] = int(parts[1])
    return table


class Lexicon:
    """Maps word sequences to token-id lists using a prepared lang dir
    (reference lexicon.py:42).

    Expects ``lang_dir`` to contain ``tokens.txt``, ``words.txt``,
    ``lexicon.txt`` (see :func:`.prepare_lang.prepare_lang`).

    Example
    -------
    >>> import os, tempfile
    >>> from speechbrain_tpu.integrations.k2_fsa.prepare_lang import (
    ...     prepare_lang,
    ... )
    >>> d = tempfile.mkdtemp()
    >>> with open(os.path.join(d, "lexicon.txt"), "w") as f:
    ...     _ = f.write("hello h e l l o\\nworld w o r l d\\n")
    >>> prepare_lang(d)
    >>> lex = Lexicon(d)
    >>> ids = lex.texts_to_token_ids(["hello world"])
    >>> [lex.token_table_inv[i] for i in ids[0]]
    ['h', 'e', 'l', 'l', 'o', 'w', 'o', 'r', 'l', 'd']
    """

    def __init__(self, lang_dir):
        self.lang_dir = lang_dir = Path(lang_dir)
        self.token_table = read_symbol_table(lang_dir / "tokens.txt")
        self.word_table = read_symbol_table(lang_dir / "words.txt")
        self.token_table_inv = {v: k for k, v in self.token_table.items()}
        self.word_table_inv = {v: k for k, v in self.word_table.items()}
        self.word2tokenids = {}
        for word, tokens in read_lexicon(lang_dir / "lexicon.txt"):
            ids = [self.token_table[t] for t in tokens]
            self.word2tokenids.setdefault(word, []).append(ids)
        self._L_arcs = None

    @property
    def L(self):
        """L FST as the arc list written by prepare_lang."""
        if self._L_arcs is None:
            arcs = []
            with open(self.lang_dir / "L.fst.txt", encoding="utf-8") as f:
                for line in f:
                    parts = line.split()
                    if len(parts) >= 4:
                        arcs.append(
                            [int(parts[0]), int(parts[1]), int(parts[2]),
                             int(parts[3]),
                             float(parts[4]) if len(parts) > 4 else 0.0]
                        )
                    elif parts:
                        arcs.append([int(parts[0])])
            self._L_arcs = arcs
        return self._L_arcs

    @property
    def tokens(self):
        """Token ids excluding <eps> and disambig symbols."""
        return [
            i for s, i in self.token_table.items()
            if s != EPS and not s.startswith("#")
        ]

    def texts_to_token_ids(self, texts, oov_token=None):
        """List of sentences -> list of flat token-id lists; OOV words
        fall back to ``oov_token``'s pronunciation or are skipped."""
        out = []
        for text in texts:
            ids = []
            for word in text.split():
                prons = self.word2tokenids.get(word)
                if prons is None and oov_token is not None:
                    prons = self.word2tokenids.get(oov_token)
                if prons:
                    ids.extend(prons[0])
            out.append(ids)
        return out

    def texts_to_word_ids(self, texts, oov_word="<UNK>"):
        """List of sentences -> list of word-id lists."""
        oov = self.word_table.get(oov_word)
        return [
            [self.word_table.get(w, oov) for w in text.split()]
            for text in texts
        ]


def prepare_char_lexicon(lang_dir, vocab_files, extra_csv_files=(),
                         column_text_key="wrd", add_word_boundary=True):
    """Generate ``lang_dir/lexicon.txt`` with characters as tokens from
    vocab files and csv transcripts (reference lexicon.py:415)."""
    lang_dir = Path(lang_dir)
    lang_dir.mkdir(parents=True, exist_ok=True)
    words = set()
    for vf in vocab_files:
        with open(vf, encoding="utf-8") as f:
            for line in f:
                w = line.strip().split()
                if w:
                    words.add(w[0])
    for cf in extra_csv_files:
        with open(cf, encoding="utf-8", newline="") as f:
            for row in csv.DictReader(f):
                for w in row[column_text_key].split():
                    words.add(w)
    lexicon = []
    for w in sorted(words):
        chars = list(w)
        if add_word_boundary:
            chars.append("<eow>")
        lexicon.append((w, chars))
    write_lexicon(lang_dir / "lexicon.txt", lexicon)
