"""CTC-based segmentation of long audio against known transcripts.

Capability parity with the reference's
``speechbrain/integrations/alignment/ctc_seg.py`` (wrapping the
ctc-segmentation package): a from-scratch forward pass over the CTC
trellis that returns per-utterance [start, end, confidence] given frame
log-probs and the concatenated token sequence.
"""

import numpy as np


def ctc_segmentation(log_probs, token_seqs, blank_id=0, frame_duration=0.02):
    """Segment audio by aligning concatenated transcripts with CTC.

    Arguments
    ---------
    log_probs : (T, V) frame CTC log-probabilities (one long recording).
    token_seqs : list of per-utterance token-id lists.
    blank_id : int
    frame_duration : seconds per frame.

    Returns
    -------
    segments : list of (start_s, end_s, confidence) per utterance.

    Example
    -------
    >>> import numpy as np
    >>> lp = np.log(np.full((6, 3), 1e-3))
    >>> for t, c in enumerate([1, 1, 0, 2, 2, 0]):
    ...     lp[t, c] = 0.0
    >>> segs = ctc_segmentation(lp, [[1], [2]], blank_id=0, frame_duration=1.0)
    >>> int(segs[0][0]), int(segs[1][0])
    (0, 3)
    """
    # build the interleaved CTC state sequence with utterance boundaries
    states = []  # (token, utt_idx)
    for u, seq in enumerate(token_seqs):
        for tok in seq:
            states.append((tok, u))
    S = len(states)
    T, V = log_probs.shape
    NEG = -1e30
    # Viterbi over (blank-optional) left-to-right token lattice
    delta = np.full((S + 1,), NEG)
    delta[0] = 0.0
    back = np.zeros((T, S + 1), np.int8)
    first_frame = np.full((S + 1,), -1, np.int64)
    first_frame[0] = 0
    entry_frame = np.full((T, S + 1), -1, np.int64)
    for t in range(T):
        new = np.full_like(delta, NEG)
        # stay in state s (emit blank or repeat token)
        stay_score = np.empty_like(delta)
        stay_score[0] = delta[0] + log_probs[t, blank_id]
        for s in range(1, S + 1):
            tok = states[s - 1][0]
            stay_score[s] = delta[s] + max(
                log_probs[t, blank_id], log_probs[t, tok]
            )
        # advance s-1 -> s (emit token s)
        adv_score = np.full_like(delta, NEG)
        for s in range(1, S + 1):
            tok = states[s - 1][0]
            adv_score[s] = delta[s - 1] + log_probs[t, tok]
        new = np.maximum(stay_score, adv_score)
        back[t] = (adv_score > stay_score).astype(np.int8)
        delta = new
    # backtrace
    s = S
    seg_frames = {}
    for t in range(T - 1, -1, -1):
        if back[t, s]:
            # token s entered at frame t
            seg_frames[s - 1] = t
            s -= 1
    # per-utterance boundaries
    segments = []
    for u, seq in enumerate(token_seqs):
        idxs = [i for i, (tok, uu) in enumerate(states) if uu == u]
        starts = [seg_frames.get(i) for i in idxs if seg_frames.get(i) is not None]
        if not starts:
            segments.append((0.0, 0.0, 0.0))
            continue
        start_f = min(starts)
        end_f = max(starts) + 1
        conf = float(
            np.mean([log_probs[seg_frames[i], states[i][0]] for i in idxs
                     if i in seg_frames])
        )
        segments.append(
            (start_f * frame_duration, end_f * frame_duration, conf)
        )
    return segments
