#!/usr/bin/env python
"""Kaldi-compatible WER computation CLI.

Capability parity with the reference's ``tools/compute_wer.py``: reads
ref and hyp files in "utt_id word1 word2 ..." format, prints the WER
summary and per-utterance alignments.

Usage: python tools/compute_wer.py ref.txt hyp.txt [--print-alignments]
"""

import argparse
import sys


def read_trn(path):
    utts = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            utts[parts[0]] = parts[1:]
    return utts


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("ref")
    parser.add_argument("hyp")
    parser.add_argument("--print-alignments", action="store_true")
    parser.add_argument("--mode", choices=["strict", "present"], default="strict")
    args = parser.parse_args()

    sys.path.insert(0, ".")
    from speechbrain_tpu.utils.metric_stats import ErrorRateStats

    refs = read_trn(args.ref)
    hyps = read_trn(args.hyp)
    ids, ref_list, hyp_list = [], [], []
    for utt, ref in refs.items():
        if utt not in hyps:
            if args.mode == "present":
                continue
            hyp = []
        else:
            hyp = hyps[utt]
        ids.append(utt)
        ref_list.append(ref)
        hyp_list.append(hyp)
    stats = ErrorRateStats()
    stats.append(ids, hyp_list, ref_list)
    stats.summarize()
    if args.print_alignments:
        stats.write_stats(sys.stdout)
    else:
        s = stats.summary
        print(
            "%WER {WER:.2f} [ {num_edits} / {num_scored_tokens}, "
            "{insertions} ins, {deletions} del, {substitutions} sub ]".format(**s)
        )


if __name__ == "__main__":
    main()
