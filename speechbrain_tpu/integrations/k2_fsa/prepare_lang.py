"""Lang-directory preparation: tokens/words tables, disambiguated
lexicon, and the L (lexicon) FST.

Capability parity with the reference's
``speechbrain/integrations/k2_fsa/prepare_lang.py`` (add_disambig_symbols
at prepare_lang.py:105, lexicon_to_fst at :235, prepare_lang at :415),
without the k2 dependency: FSTs are emitted as arc lists and serialized
in OpenFST text format (``L.fst.txt``) instead of k2 ``.pt`` blobs.
"""

from collections import defaultdict
from pathlib import Path

from speechbrain_tpu.integrations.k2_fsa.lexicon import (
    read_lexicon,
    write_lexicon,
)

EPS = "<eps>"


def write_mapping(filename, sym2id):
    """Write a symbol table, one ``symbol id`` per line
    (reference prepare_lang.py:31)."""
    with open(filename, "w", encoding="utf-8") as f:
        for sym, i in sym2id.items():
            f.write(f"{sym} {i}\n")


def get_tokens(lexicon, sil_token="SIL", manually_add_sil_to_tokens=False):
    """Unique tokens in the lexicon (reference prepare_lang.py:50)."""
    tokens = set()
    if manually_add_sil_to_tokens:
        tokens.add(sil_token)
    for _, toks in lexicon:
        tokens.update(toks)
    if EPS in tokens:
        raise ValueError(f"{EPS} is not a valid token")
    return sorted(tokens)


def get_words(lexicon):
    """Unique words in the lexicon (reference prepare_lang.py:84)."""
    return sorted({word for word, _ in lexicon})


def add_disambig_symbols(lexicon):
    """Append #1, #2, ... to pronunciations that are duplicated or are
    prefixes of others (reference prepare_lang.py:105; kaldi's
    add_lex_disambig.pl). Returns ``(lexicon, max_disambig)``."""
    count = defaultdict(int)
    for _, tokens in lexicon:
        count[" ".join(tokens)] += 1

    issubseq = defaultdict(int)
    for _, tokens in lexicon:
        toks = list(tokens[:-1])
        while toks:
            issubseq[" ".join(toks)] = 1
            toks.pop()

    ans = []
    first_allowed = 1
    max_disambig = first_allowed - 1
    last_used = defaultdict(int)
    for word, tokens in lexicon:
        seq = " ".join(tokens)
        if not seq:
            raise ValueError(f"word {word!r} has an empty pronunciation")
        if issubseq[seq] == 0 and count[seq] == 1:
            ans.append((word, list(tokens)))
            continue
        cur = last_used[seq]
        cur = first_allowed if cur == 0 else cur + 1
        max_disambig = max(max_disambig, cur)
        last_used[seq] = cur
        ans.append((word, list(tokens) + [f"#{cur}"]))
    return ans, max_disambig


def generate_id_map(symbols):
    """symbol -> contiguous id (reference prepare_lang.py:176)."""
    return {sym: i for i, sym in enumerate(symbols)}


def add_self_loops(arcs, disambig_token, disambig_word):
    """Add a (#disambig : #disambig) self-loop at every state that has at
    least one outgoing arc (reference prepare_lang.py:192); lets
    disambiguation symbols pass through during composition."""
    states = {arc[0] for arc in arcs if len(arc) >= 4}
    loops = [
        [s, s, disambig_token, disambig_word, 0.0] for s in sorted(states)
    ]
    return sorted(
        [list(a) for a in arcs] + loops, key=lambda a: (a[0], a[1])
    )


def lexicon_to_fst(lexicon, token2id, word2id, sil_token="SIL",
                   sil_prob=0.5, need_self_loops=False):
    """Lexicon -> L FST arc list with optional silence insertion
    (reference prepare_lang.py:235).

    Arcs are ``[src, dst, token_id, word_id, weight]`` with -ln
    probabilities; final state marked by a single ``[state]`` row.
    """
    import math

    if not 0.0 < sil_prob < 1.0:
        raise ValueError("sil_prob must be in (0, 1)")
    sil_score = -math.log(sil_prob)
    no_sil_score = -math.log(1.0 - sil_prob)

    start_state = 0
    loop_state = 1
    sil_state = 2
    next_state = 3
    eps_id = token2id[EPS] if EPS in token2id else 0
    eps_word = word2id[EPS] if EPS in word2id else 0
    sil_id = token2id[sil_token]

    arcs = [
        [start_state, loop_state, eps_id, eps_word, no_sil_score],
        [start_state, sil_state, eps_id, eps_word, sil_score],
        [sil_state, loop_state, sil_id, eps_word, 0.0],
    ]
    for word, tokens in lexicon:
        w = word2id[word]
        cur = loop_state
        for i, tok in enumerate(tokens[:-1]):
            arcs.append(
                [cur, next_state, token2id[tok], w if i == 0 else eps_word,
                 0.0]
            )
            cur = next_state
            next_state += 1
        last = token2id[tokens[-1]]
        olabel = w if len(tokens) == 1 else eps_word
        arcs.append([cur, loop_state, last, olabel, no_sil_score])
        arcs.append([cur, sil_state, last, olabel, sil_score])
    final_state = next_state
    arcs.append([loop_state, final_state, -1, -1, 0.0])
    arcs.append([final_state])
    if need_self_loops:
        body = [a for a in arcs if len(a) >= 4 and a[2] != -1]
        tail = [a for a in arcs if len(a) < 4 or a[2] == -1]
        disambig_token = token2id["#0"]
        disambig_word = word2id["#0"]
        arcs = add_self_loops(body, disambig_token, disambig_word) + tail
    return arcs


def lexicon_to_fst_no_sil(lexicon, token2id, word2id,
                          need_self_loops=False):
    """Silence-free L FST (reference prepare_lang.py:337)."""
    loop_state = 0
    next_state = 1
    eps_word = word2id[EPS] if EPS in word2id else 0
    arcs = []
    for word, tokens in lexicon:
        w = word2id[word]
        cur = loop_state
        for i, tok in enumerate(tokens[:-1]):
            arcs.append(
                [cur, next_state, token2id[tok], w if i == 0 else eps_word,
                 0.0]
            )
            cur = next_state
            next_state += 1
        olabel = w if len(tokens) == 1 else eps_word
        arcs.append([cur, loop_state, token2id[tokens[-1]], olabel, 0.0])
    final_state = next_state
    arcs.append([loop_state, final_state, -1, -1, 0.0])
    arcs.append([final_state])
    if need_self_loops:
        body = [a for a in arcs if len(a) >= 4 and a[2] != -1]
        tail = [a for a in arcs if len(a) < 4 or a[2] == -1]
        arcs = add_self_loops(
            body, token2id["#0"], word2id["#0"]
        ) + tail
    return arcs


def write_fst_text(filename, arcs):
    """Serialize an arc list in OpenFST text format."""
    with open(filename, "w", encoding="utf-8") as f:
        for arc in arcs:
            f.write(" ".join(str(x) for x in arc) + "\n")


def prepare_lang(lang_dir, sil_token="SIL", sil_prob=0.5, cache=True):
    """Build a lang directory from ``lang_dir/lexicon.txt``
    (reference prepare_lang.py:415): writes ``tokens.txt``,
    ``words.txt``, ``lexicon_disambig.txt``, ``L.fst.txt`` and
    ``L_disambig.fst.txt``.

    Example
    -------
    >>> import os, tempfile
    >>> d = tempfile.mkdtemp()
    >>> with open(os.path.join(d, "lexicon.txt"), "w") as f:
    ...     _ = f.write("hello h e l l o\\nworld w o r l d\\n")
    >>> prepare_lang(d)
    >>> sorted(os.listdir(d))  # doctest: +NORMALIZE_WHITESPACE
    ['L.fst.txt', 'L_disambig.fst.txt', 'lexicon.txt',
     'lexicon_disambig.txt', 'tokens.txt', 'words.txt']
    """
    lang_dir = Path(lang_dir)
    lexicon = read_lexicon(lang_dir / "lexicon.txt")
    if sil_prob > 0 and not any(
        sil_token in toks for _, toks in lexicon
    ):
        sil_in_lexicon = False
    else:
        sil_in_lexicon = True
    tokens = get_tokens(
        lexicon, sil_token=sil_token,
        manually_add_sil_to_tokens=sil_prob > 0 and not sil_in_lexicon,
    )
    words = get_words(lexicon)
    lex_disambig, max_disambig = add_disambig_symbols(lexicon)

    for i in range(max_disambig + 2):
        tokens.append(f"#{i}")
    tokens = [EPS] + tokens
    words = [EPS] + words + ["#0", "<s>", "</s>"]

    token2id = generate_id_map(tokens)
    word2id = generate_id_map(words)

    write_mapping(lang_dir / "tokens.txt", token2id)
    write_mapping(lang_dir / "words.txt", word2id)
    write_lexicon(lang_dir / "lexicon_disambig.txt", lex_disambig)

    if sil_prob > 0:
        L = lexicon_to_fst(
            lexicon, token2id, word2id, sil_token=sil_token,
            sil_prob=sil_prob,
        )
        L_disambig = lexicon_to_fst(
            lex_disambig, token2id, word2id, sil_token=sil_token,
            sil_prob=sil_prob, need_self_loops=True,
        )
    else:
        L = lexicon_to_fst_no_sil(lexicon, token2id, word2id)
        L_disambig = lexicon_to_fst_no_sil(
            lex_disambig, token2id, word2id, need_self_loops=True
        )
    write_fst_text(lang_dir / "L.fst.txt", L)
    write_fst_text(lang_dir / "L_disambig.fst.txt", L_disambig)
