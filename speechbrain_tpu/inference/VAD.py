"""Voice activity detection pipeline.

Capability parity with the reference's ``speechbrain/inference/VAD.py``
(VAD :25): chunked neural posteriors -> thresholding -> boundary
extraction -> merge/remove -> optional energy-based refinement and
double-checking. Posterior computation is jitted per chunk; the boundary
logic is host-side numpy (it produces ragged segment lists).
"""

import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.inference.interfaces import Pretrained


class VAD(Pretrained):
    """Speech/non-speech detection (reference VAD.py:25).

    hparams: compute_features, mean_var_norm (optional), model (outputs
    frame posteriors), sample_rate, time_resolution.
    """

    HPARAMS_NEEDED = ["sample_rate"]
    MODULES_NEEDED = ["cnn" if False else "model"]

    def get_speech_prob_chunk(self, wavs, wav_lens=None):
        """Frame-level speech posteriors for a batch of chunks."""
        feats = self.hparams.compute_features(wavs)
        if hasattr(self.hparams, "mean_var_norm") and self.hparams.mean_var_norm:
            lens = wav_lens if wav_lens is not None else jnp.ones(wavs.shape[0])
            feats = self.hparams.mean_var_norm(feats, lens)
        out = self.apply("model", feats)
        if out.shape[-1] == 1:
            import jax

            return jax.nn.sigmoid(out)
        import jax

        return jax.nn.softmax(out, axis=-1)[..., -1:]

    def get_speech_prob_file(self, audio_file, large_chunk_size=30,
                             small_chunk_size=10, overlap_small_chunk=False):
        """Posteriors over a whole file, processed in chunks. With
        ``overlap_small_chunk`` the small chunks overlap 50% and are
        recombined with hamming weights (reference
        VAD.py:_manage_overlapped_chunks) to smooth boundary effects."""
        audio = self.load_audio(audio_file)
        sr = self.hparams.sample_rate
        chunk_len = int(small_chunk_size * sr)
        T = audio.shape[0]
        if not overlap_small_chunk:
            n_chunks = -(-T // chunk_len)
            pad = n_chunks * chunk_len - T
            audio = jnp.pad(audio, (0, pad))
            chunks = audio.reshape(n_chunks, chunk_len)
            probs = self.get_speech_prob_chunk(chunks)
            return probs.reshape(1, -1, 1)[:, : self._n_frames(T), :]
        stride = chunk_len // 2
        n_chunks = max(1, -(-max(T - chunk_len, 0) // stride) + 1)
        needed = (n_chunks - 1) * stride + chunk_len
        audio = jnp.pad(audio, (0, max(0, needed - T)))
        chunks = self.create_chunks(
            audio[None], chunk_size=chunk_len, chunk_stride=stride
        )
        probs = np.asarray(self.get_speech_prob_chunk(chunks))  # (N, F, 1)
        F = probs.shape[1]
        hop = F // 2
        total = self._n_frames(needed)
        acc = np.zeros(total + F)
        weight = np.zeros(total + F)
        w = np.hamming(F)
        for i in range(probs.shape[0]):
            s = i * hop
            acc[s : s + F] += probs[i, :, 0] * w
            weight[s : s + F] += w
        out = acc[: total] / np.maximum(weight[: total], 1e-8)
        return jnp.asarray(out)[None, : self._n_frames(T), None]

    @staticmethod
    def create_chunks(x, chunk_size=16384, chunk_stride=16384):
        """Split (1, T) signal into strided chunks (N, chunk_size)
        (reference VAD.py:624)."""
        x = np.asarray(x).reshape(-1)
        n = max(1, (len(x) - chunk_size) // chunk_stride + 1)
        idx = (
            np.arange(n)[:, None] * chunk_stride
            + np.arange(chunk_size)[None, :]
        )
        idx = np.minimum(idx, len(x) - 1)
        return jnp.asarray(x[idx])

    def upsample_VAD(self, vad_out, audio_file, time_resolution=0.01):
        """Frame-level decisions -> sample-level signal aligned with the
        file (reference VAD.py:656)."""
        audio = self.load_audio(audio_file)
        sr = self.hparams.sample_rate
        T = audio.shape[0]
        frame = int(time_resolution * sr)
        vad = np.asarray(vad_out).reshape(-1)
        up = np.repeat(vad, frame)[:T]
        if len(up) < T:
            up = np.pad(up, (0, T - len(up)))
        return jnp.asarray(up)[None, :, None]

    def upsample_boundaries(self, boundaries, audio_file):
        """[start, end] seconds -> sample-level binary signal
        (reference VAD.py:702)."""
        audio = self.load_audio(audio_file)
        sr = self.hparams.sample_rate
        T = audio.shape[0]
        sig = np.zeros(T)
        for s, e in np.asarray(boundaries).reshape(-1, 2):
            sig[int(s * sr): int(e * sr)] = 1.0
        return jnp.asarray(sig)[None, :, None]

    def get_segments(self, boundaries, audio_file, before_margin=0.1,
                     after_margin=0.1):
        """Crop the detected speech segments out of the audio
        (reference VAD.py:785)."""
        audio = self.load_audio(audio_file)
        sr = self.hparams.sample_rate
        T = audio.shape[0]
        segments = []
        for s, e in np.asarray(boundaries).reshape(-1, 2):
            beg = max(0, int((s - before_margin) * sr))
            end = min(T, int((e + after_margin) * sr))
            segments.append(audio[beg:end])
        return segments

    def save_boundaries(self, boundaries, save_path=None,
                        print_boundaries=True, audio_file=None):
        """Write/print segments in the reference's format (VAD.py:448):
        alternating SPEECH / NON_SPEECH rows covering the whole file."""
        boundaries = np.asarray(boundaries).reshape(-1, 2)
        last = 0.0
        if audio_file is not None:
            total = self.load_audio(audio_file).shape[0] / (
                self.hparams.sample_rate
            )
        else:
            total = boundaries[-1, 1] if len(boundaries) else 0.0
        rows, cnt = [], 0
        events = list(boundaries) + [[total, total]]
        for s, e in events:
            if s > last:
                rows.append((last, s, "NON_SPEECH"))
            if e > s:
                rows.append((s, e, "SPEECH"))
            last = max(last, e)
        lines = [
            f"segment_{i + 1:03d}  {s:.2f}  {e:.2f} {label}"
            for i, (s, e, label) in enumerate(rows)
        ]
        text = "\n".join(lines)
        if print_boundaries:
            print(text)
        if save_path is not None:
            with open(save_path, "w") as f:
                f.write(text + "\n")
        return lines

    def _n_frames(self, n_samples):
        res = getattr(self.hparams, "time_resolution", 0.01)
        return int(n_samples / (self.hparams.sample_rate * res))

    @staticmethod
    def apply_threshold(vad_prob, activation_th=0.5, deactivation_th=0.25):
        """Hysteresis thresholding (reference VAD.py:apply_threshold)."""
        vad_prob = np.asarray(vad_prob)
        vad = np.zeros_like(vad_prob)
        for b in range(vad_prob.shape[0]):
            active = False
            for t in range(vad_prob.shape[1]):
                p = vad_prob[b, t, 0]
                if not active and p >= activation_th:
                    active = True
                elif active and p < deactivation_th:
                    active = False
                vad[b, t, 0] = 1.0 if active else 0.0
        return vad

    def get_boundaries(self, prob_th, output_value="seconds"):
        """Binary frame decisions -> [start, end] segment array."""
        prob_th = np.asarray(prob_th)
        res = getattr(self.hparams, "time_resolution", 0.01)
        boundaries = []
        for b in range(prob_th.shape[0]):
            x = prob_th[b, :, 0]
            diff = np.diff(np.concatenate([[0.0], x, [0.0]]))
            starts = np.where(diff == 1)[0]
            ends = np.where(diff == -1)[0]
            for s, e in zip(starts, ends):
                if output_value == "seconds":
                    boundaries.append([s * res, e * res])
                else:
                    boundaries.append([int(s), int(e)])
        return np.asarray(boundaries).reshape(-1, 2)

    @staticmethod
    def merge_close_segments(boundaries, close_th=0.25):
        """Merge segments closer than close_th seconds
        (reference VAD.py:merge_close_segments)."""
        if len(boundaries) == 0:
            return boundaries
        out = [list(boundaries[0])]
        for seg in boundaries[1:]:
            if seg[0] - out[-1][1] <= close_th:
                out[-1][1] = seg[1]
            else:
                out.append(list(seg))
        return np.asarray(out)

    @staticmethod
    def remove_short_segments(boundaries, len_th=0.25):
        """Drop segments shorter than len_th seconds."""
        if len(boundaries) == 0:
            return boundaries
        keep = [seg for seg in boundaries if seg[1] - seg[0] >= len_th]
        return np.asarray(keep).reshape(-1, 2)

    def energy_VAD(self, audio_file, boundaries, activation_th=0.5,
                   deactivation_th=0.0, eps=1e-6):
        """Refine segments with frame energies (reference VAD.py:energy_VAD)."""
        audio = np.asarray(self.load_audio(audio_file))
        sr = self.hparams.sample_rate
        res = getattr(self.hparams, "time_resolution", 0.01)
        frame = int(res * sr)
        refined = []
        for s, e in boundaries:
            seg = audio[int(s * sr) : int(e * sr)]
            if len(seg) < frame:
                continue
            n = len(seg) // frame
            energies = (
                np.log(
                    (seg[: n * frame].reshape(n, frame) ** 2).mean(axis=1) + eps
                )
            )
            # normalize energies to [0,1]
            energies = (energies - energies.min()) / max(
                energies.max() - energies.min(), eps
            )
            active = energies > activation_th
            diff = np.diff(np.concatenate([[0], active.astype(int), [0]]))
            starts = np.where(diff == 1)[0]
            ends = np.where(diff == -1)[0]
            for ss, ee in zip(starts, ends):
                refined.append([s + ss * res, s + ee * res])
        return np.asarray(refined).reshape(-1, 2)

    def double_check_speech_segments(self, boundaries, audio_file, speech_th=0.5):
        """Re-score candidate segments with the neural model."""
        audio = self.load_audio(audio_file)
        sr = self.hparams.sample_rate
        checked = []
        for s, e in boundaries:
            seg = audio[int(s * sr) : int(e * sr)]
            if seg.shape[0] < int(0.05 * sr):
                continue
            prob = self.get_speech_prob_chunk(seg[None])
            if float(jnp.mean(prob)) > speech_th:
                checked.append([s, e])
        return np.asarray(checked).reshape(-1, 2)

    def get_speech_segments(
        self, audio_file, large_chunk_size=30, small_chunk_size=10,
        apply_energy_VAD=False, double_check=True, close_th=0.25,
        len_th=0.25, activation_th=0.5, deactivation_th=0.25,
        en_activation_th=0.5, en_deactivation_th=0.0, speech_th=0.5,
    ):
        """Full pipeline: file -> [start, end] speech segments
        (reference VAD.py:get_speech_segments)."""
        prob = self.get_speech_prob_file(
            audio_file, large_chunk_size, small_chunk_size
        )
        prob_th = self.apply_threshold(prob, activation_th, deactivation_th)
        boundaries = self.get_boundaries(prob_th)
        if apply_energy_VAD:
            boundaries = self.energy_VAD(
                audio_file, boundaries, en_activation_th, en_deactivation_th
            )
        boundaries = self.merge_close_segments(boundaries, close_th)
        boundaries = self.remove_short_segments(boundaries, len_th)
        if double_check and len(boundaries):
            boundaries = self.double_check_speech_segments(
                boundaries, audio_file, speech_th
            )
        return boundaries
