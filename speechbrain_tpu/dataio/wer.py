"""WER report pretty-printers.

Capability parity with the reference's ``speechbrain/dataio/wer.py``
(print_wer_summary :17, print_alignments :60): Kaldi-compatible text
reports from utils.edit_distance summaries/details.
"""

import sys


def print_wer_summary(wer_details, file=None):
    """Print the corpus-level WER block (reference wer.py:17)."""
    file = file or sys.stdout
    print(
        "%WER {WER:.2f} [ {num_edits} / {num_scored_tokens}, "
        "{insertions} ins, {deletions} del, {substitutions} sub ]".format(
            **wer_details
        ),
        file=file,
    )
    print(
        "%SER {SER:.2f} [ {num_erroneous_sents} / {num_scored_sents} ]".format(
            **wer_details
        ),
        file=file,
    )
    print(
        "Scored {num_scored_sents} sentences, {num_absent_sents} not present"
        " in hyp.".format(**wer_details),
        file=file,
    )


def print_alignments(details_by_utterance, file=None, empty_symbol="<eps>",
                     separator=" ; "):
    """Print per-utterance alignments (reference wer.py:60)."""
    file = file or sys.stdout
    print("=" * 80, file=file)
    print("ALIGNMENTS", file=file)
    for d in details_by_utterance:
        if not d.get("alignment"):
            continue
        print("", file=file)
        print(
            f"{d['key']}, %WER {d['WER']:.2f} [ {d['num_edits']} / "
            f"{d['num_ref_tokens']}, {d['insertions']} ins, "
            f"{d['deletions']} del, {d['substitutions']} sub ]",
            file=file,
        )
        ref = d["ref_tokens"]
        hyp = d["hyp_tokens"]
        ref_line, op_line, hyp_line = [], [], []
        for op, ri, hi in d["alignment"]:
            r = str(ref[ri]) if ri is not None else empty_symbol
            h = str(hyp[hi]) if hi is not None else empty_symbol
            w = max(len(r), len(h), len(op))
            ref_line.append(r.ljust(w))
            op_line.append(op.ljust(w))
            hyp_line.append(h.ljust(w))
        print(separator.join(ref_line), file=file)
        print(separator.join(op_line), file=file)
        print(separator.join(hyp_line), file=file)
