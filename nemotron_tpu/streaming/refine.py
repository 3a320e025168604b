"""Two-pass serving: online greedy segmentation + offline per-utterance
beam refinement.

The LM-fusion harness measured (docs/lm_quality.json) that shallow fusion
WINS on per-utterance decoding but LOSES on long unsegmented streams (the
LM conditions on minutes of error-containing history); the prescribed fix
was "segment with endpointing before fusing" — but engine endpointing is
greedy-only, so segment-then-fuse was not realizable in one pass. This
module closes the loop with the standard two-pass serving pattern:

  1. the ServingEngine runs ONLINE greedy with utterance endpointing and
     keep_segment_audio=True (each slot retains the current utterance's
     raw PCM, cut exactly at the endpointer's processed-frame boundary);
  2. each finished utterance is re-decoded OFFLINE as a batch: beam
     search with LM shallow fusion (or second-pass rescoring), per
     utterance, with a fresh LM history — exactly the regime where
     fusion measurably wins.

The refined text arrives one endpoint-silence later than the online
greedy partials: operators show the greedy text live and replace it
per-utterance. The reference has neither serving nor an LM; this whole
layer is beyond-reference capability.
"""

from __future__ import annotations

import numpy as np


class SegmentRefiner:
    """Batched offline re-decode of endpointed utterance segments.

    refine(segments) runs ONE batched transcribe_batch over all segments
    (beam + optional LM fusion/rescoring). drain(engine) is the serving
    glue: polls the engine's endpoint events with audio and returns
    [(slot, online_text, refined_text, tokens)] per finished utterance.
    """

    def __init__(self, params, cfg, vocab, beam_size: int = 4,
                 beam_expansions: int | None = None,
                 lm=None, lm_weight: float = 0.3, lm_bonus: float = 0.0,
                 lm_rescore: bool = False, compute_dtype=None):
        import jax.numpy as jnp

        self.params = params
        self.cfg = cfg
        self.vocab = vocab
        self.beam_size = beam_size
        self.beam_expansions = beam_expansions
        self.lm = lm
        self.lm_weight = lm_weight
        self.lm_bonus = lm_bonus
        self.lm_rescore = lm_rescore
        self.dtype = compute_dtype if compute_dtype is not None \
            else jnp.float32
        if beam_size <= 1:
            raise ValueError("refinement is a beam re-decode; beam_size>1")

    def refine(self, segments: list[np.ndarray]) -> list[str]:
        """Re-decode raw-PCM segments (one utterance each) in one batch.

        Shapes are BUCKETED (batch padded to the next power of two with
        silence rows, mel time padded to the next power-of-two frame
        count via transcribe_batch's min_mel_frames) so jit compiles
        O(log B * log T) programs instead of one per distinct
        (segment count, longest length) -- without bucketing, essentially
        every endpoint would trigger a fresh multi-second compile while
        the server holds its engine lock, freezing all live streams.
        Both pads are exact: batch rows never interact (per-row attention)
        and time padding is masked via enc_lengths."""
        from .session import transcribe_batch

        if not segments:
            return []
        # transcribe_batch zero-pads to the longest segment and masks via
        # enc_lengths, so ragged segment lengths batch fine; a 1-element
        # list still returns a list (transcribe_batch unwraps only
        # non-list inputs)
        segs = [np.asarray(s, np.int16) for s in segments]
        # guard degenerate cuts (endpointer fired with an empty buffer)
        min_len = 400  # one 25 ms window
        segs = [s if s.size >= min_len
                else np.pad(s, (0, min_len - s.size)) for s in segs]
        n_true = len(segs)
        n_bucket = 1
        while n_bucket < n_true:
            n_bucket *= 2
        segs += [np.zeros(min_len, np.int16)] * (n_bucket - n_true)
        # upper bound on the longest segment's mel frames (hop 160; +4
        # covers center-pad and residue), bucketed up; transcribe_batch
        # takes max(actual, bucket) so an undershoot only recompiles,
        # never corrupts
        mel_upper = max(s.size for s in segs) // 160 + 4
        tm_bucket = 128          # 1.28 s floor
        while tm_bucket < mel_upper:
            tm_bucket *= 2
        texts = transcribe_batch(
            self.params, self.cfg, self.vocab, segs,
            compute_dtype=self.dtype,
            beam_size=self.beam_size,
            beam_expansions=self.beam_expansions,
            lm=self.lm, lm_weight=self.lm_weight,
            lm_bonus=self.lm_bonus, lm_rescore=self.lm_rescore,
            min_mel_frames=tm_bucket)
        return texts[:n_true]

    def drain(self, engine) -> list[tuple[int, str, str, list]]:
        """Poll the engine's finished utterances and refine them in one
        batch. Returns [(slot, online_text, refined_text, tokens)]."""
        events = engine.poll_endpoints(with_audio=True)
        if not events:
            return []
        refined = self.refine([seg for _s, _t, _tk, seg in events])
        return [(s, text, rtext, toks)
                for (s, text, toks, _seg), rtext in zip(events, refined)]
