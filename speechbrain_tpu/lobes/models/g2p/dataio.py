"""Data pipelines for G2P training.

Capability parity with the reference's
``speechbrain/lobes/models/g2p/dataio.py`` (clean_pipeline at dataio.py:22,
grapheme_pipeline at :45, phoneme_pipeline at :276, add_bos_eos at :305,
char maps at :393-528): host-side text processing feeding the
DynamicItemDataset pipelines; device work stays in the model.
"""

import numpy as np


def clean_pipeline(txt, graphemes):
    """Keep only characters present in the grapheme set (uppercased)
    (reference dataio.py:22)."""
    result = txt.upper()
    return "".join(ch for ch in result if ch in graphemes)


def grapheme_pipeline(char, grapheme_encoder=None, uppercase=True):
    """Text -> (grapheme list, encoded list, encoded array)
    (reference dataio.py:45). Generator-style multi-provide."""
    if uppercase:
        char = char.upper()
    grapheme_list = list(char)
    yield grapheme_list
    if grapheme_encoder is None:
        yield None
        yield None
        return
    encoded_list = grapheme_encoder.encode_sequence(grapheme_list)
    yield encoded_list
    yield np.asarray(encoded_list, np.int32)


def phoneme_pipeline(phn, phoneme_encoder=None):
    """Phoneme list -> (list, encoded list, encoded array)
    (reference dataio.py:276)."""
    if isinstance(phn, str):
        phn = phn.strip().split(" ")
    yield phn
    if phoneme_encoder is None:
        yield None
        yield None
        return
    encoded_list = phoneme_encoder.encode_sequence(phn)
    yield encoded_list
    yield np.asarray(encoded_list, np.int32)


def enable_eos_bos(tokens, encoder, bos_index, eos_index):
    """Register bos/eos on an encoder, creating it if needed
    (reference dataio.py:231)."""
    from speechbrain_tpu.dataio.encoder import TextEncoder

    if encoder is None:
        encoder = TextEncoder()
    if bos_index == eos_index:
        encoder.insert_bos_eos(
            bos_label="<eos-bos>", eos_label="<eos-bos>", bos_index=bos_index
        )
    else:
        encoder.insert_bos_eos(
            bos_label="<bos>", eos_label="<eos>", bos_index=bos_index,
            eos_index=eos_index,
        )
    encoder.update_from_iterable(tokens, sequence_input=False)
    return encoder


def add_bos_eos(seq=None, encoder=None):
    """Token sequence -> (with-bos array, len, with-eos array, len)
    (reference dataio.py:305)."""
    seq_bos = encoder.prepend_bos_index(seq)
    yield np.asarray(seq_bos, np.int32)
    yield len(seq_bos)
    seq_eos = encoder.append_eos_index(seq)
    yield np.asarray(seq_eos, np.int32)
    yield len(seq_eos)


def beam_search_pipeline(char_lens, encoder_out, beam_searcher):
    """Run a beam searcher over encoder states (reference dataio.py:334)."""
    hyps, _, scores, _ = beam_searcher(encoder_out, char_lens)
    return hyps, scores


def phoneme_decoder_pipeline(hyps, phoneme_encoder):
    """Decode hypothesis ids back to phoneme labels
    (reference dataio.py:357)."""
    return [phoneme_encoder.decode_ndim(h) for h in hyps]


def char_range(start_char, end_char):
    """Characters from start to end inclusive (reference dataio.py:375)."""
    return [chr(i) for i in range(ord(start_char), ord(end_char) + 1)]


def build_token_char_map(tokens):
    """Map tokens -> single characters for char-level tokenizers
    (reference dataio.py:393)."""
    chars = char_range("A", "Z") + char_range("a", "z")
    if len(tokens) > len(chars):
        raise ValueError("too many tokens for a char map")
    return {tok: chars[i] for i, tok in enumerate(tokens)}


def flip_map(map_dict):
    """Invert a dict (reference dataio.py:415)."""
    return {v: k for k, v in map_dict.items()}


def text_decode(seq, encoder):
    """Decode an encoded sequence to labels (reference dataio.py:431)."""
    return encoder.decode_ndim(seq)


def char_map_detokenize(char_map, tokenizer, token_space_index=None,
                        wordwise=True):
    """Build a pipeline fn mapping tokenizer output back through a char
    map (reference dataio.py:450)."""

    def detokenize(tokens):
        out = []
        for row in tokens:
            text = tokenizer.decode_ids(row) if hasattr(
                tokenizer, "decode_ids"
            ) else "".join(row)
            out.append([char_map[ch] for ch in text if ch in char_map])
        return out

    return detokenize


def get_sequence_key(key, mode):
    """Resolve a dataset key for the given tokenization mode
    (reference dataio.py:588)."""
    return key if mode == "raw" else f"{key}_{mode}"


def phonemes_to_label(phns, decoder):
    """Phoneme index batches -> space-joined label strings
    (reference dataio.py:606)."""
    phn_decoded = decoder(phns)
    return [" ".join(remove_special(p)) for p in phn_decoded]


def remove_special(phn):
    """Strip special <...> tokens from a phoneme list
    (reference dataio.py:628)."""
    return [p for p in phn if "<" not in str(p)]


def word_emb_pipeline(txt, txt_len, char_map=None, word_emb=None,
                      use_word_emb=None):
    """Look up word embeddings for each token position
    (reference dataio.py:645); requires a word_emb callable."""
    if not use_word_emb or word_emb is None:
        return None
    return word_emb(txt)
