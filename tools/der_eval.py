#!/usr/bin/env python3
"""Diarization error rate evaluation from RTTM files.

Capability parity with the reference's ``tools/der_eval`` (which wraps the
NIST ``md-eval.pl`` perl script): a pure-python DER CLI over standard RTTM
inputs, reporting per-recording and overall DER.

Usage:
    python tools/der_eval.py --ref ref.rttm --hyp hyp.rttm [--collar 0.25]
"""

import argparse
import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from speechbrain_tpu.utils.DER import DER  # noqa: E402


def read_rttm(path):
    """Parse an RTTM file into {rec_id: [(start, end, speaker)]}."""
    recs = defaultdict(list)
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0] != "SPEAKER":
                continue
            rec, start, dur, spk = (
                parts[1], float(parts[3]), float(parts[4]), parts[7],
            )
            recs[rec].append((start, start + dur, spk))
    return recs


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ref", required=True, help="reference RTTM")
    parser.add_argument("--hyp", required=True, help="hypothesis RTTM")
    parser.add_argument("--collar", type=float, default=0.25,
                        help="no-score collar around reference boundaries (s)")
    parser.add_argument("--step", type=float, default=0.01,
                        help="frame step for discretization (s)")
    args = parser.parse_args(argv)

    ref = read_rttm(args.ref)
    hyp = read_rttm(args.hyp)
    if not ref:
        parser.error(f"no SPEAKER lines found in {args.ref}")

    total_weighted = 0.0
    total_dur = 0.0
    print(f"{'recording':<30s} {'DER%':>8s} {'ref_dur':>9s}")
    for rec in sorted(ref):
        der = DER(ref[rec], hyp.get(rec, []), collar=args.collar,
                  step=args.step)
        dur = sum(e - s for s, e, _ in ref[rec])
        total_weighted += der * dur
        total_dur += dur
        print(f"{rec:<30s} {100 * der:8.2f} {dur:9.2f}")
    missing = set(hyp) - set(ref)
    if missing:
        print(f"WARNING: {len(missing)} hypothesis recording(s) not in "
              f"reference: {sorted(missing)[:5]}", file=sys.stderr)
    overall = total_weighted / max(total_dur, 1e-9)
    print(f"{'OVERALL':<30s} {100 * overall:8.2f} {total_dur:9.2f}")
    return overall


if __name__ == "__main__":
    main()
