#!/usr/bin/env python3
"""Grapheme-to-phoneme CLI.

Capability parity with the reference's ``tools/g2p.py``: transcribe a
single ``--text``, a ``--text-file`` (one utterance per line, streamed),
or run an ``--interactive`` shell, on top of
``speechbrain_tpu.inference.text.GraphemeToPhoneme``.

Usage:
    python tools/g2p.py --model <hparams-dir> --text "hello world"
    python tools/g2p.py --model <hparams-dir> --text-file in.txt \\
        --output-file out.txt
    python tools/g2p.py --model <hparams-dir> --interactive
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def transcribe_text(g2p, text):
    """One line of text -> space-joined phoneme string."""
    return " ".join(g2p(text))


def transcribe_stream(g2p, in_f, out_f):
    """Transcribe line-per-utterance streams."""
    count = 0
    for line in in_f:
        line = line.strip()
        if not line:
            continue
        out_f.write(transcribe_text(g2p, line) + "\n")
        count += 1
    return count


def interactive_shell(g2p):
    """Tiny REPL: type text, get phonemes; 'q' to quit."""
    print("G2P interactive shell. Type text (or 'q' to quit).")
    while True:
        try:
            line = input("g2p> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if line in ("q", "quit", "exit"):
            break
        if line:
            print(transcribe_text(g2p, line))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", required=True,
                        help="hparams dir / source for from_hparams")
    parser.add_argument("--hparams", default="hyperparams.yaml",
                        help="hparams filename within the model source")
    parser.add_argument("--text", help="text to transcribe")
    parser.add_argument("--text-file", help="text file to transcribe")
    parser.add_argument("--output-file", help="write transcriptions here")
    parser.add_argument("--interactive", action="store_true",
                        help="interactive shell")
    args = parser.parse_args(argv)

    if not (args.text or args.text_file or args.interactive):
        parser.error("one of --text, --text-file, --interactive is required")

    from speechbrain_tpu.inference.text import GraphemeToPhoneme

    g2p = GraphemeToPhoneme.from_hparams(
        source=args.model, hparams_file=args.hparams
    )

    if args.text:
        print(transcribe_text(g2p, args.text))
    if args.text_file:
        out = (open(args.output_file, "w", encoding="utf-8")
               if args.output_file else sys.stdout)
        try:
            with open(args.text_file, encoding="utf-8") as f:
                transcribe_stream(g2p, f, out)
        finally:
            if args.output_file:
                out.close()
    if args.interactive:
        interactive_shell(g2p)


if __name__ == "__main__":
    main()
