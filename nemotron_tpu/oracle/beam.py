"""Plain-Python RNN-T beam search oracle: the differential ground truth for
`models/beam.py`'s batched on-device search. Single stream, Python lists,
no vectorization tricks -- deliberately the simplest possible statement of
the algorithm (per-frame expansion rounds, blank finishes the frame with
the prediction-network state frozen, top-K merge, force-finish after the
expansion bound). Consumes the raw weight dict like OracleModel."""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import MAX_SYMBOLS_PER_STEP, ModelConfig
from . import ops


@dataclasses.dataclass
class Hyp:
    tokens: list
    score: float
    h: np.ndarray      # [L, H]
    c: np.ndarray
    prev: int


def log_softmax(x):
    m = np.max(x)
    e = x - m
    return e - np.log(np.sum(np.exp(e)))


class OracleBeam:
    def __init__(self, t: dict, cfg: ModelConfig):
        self.t = t
        self.cfg = cfg

    def _dec_step(self, prev: int, h, c):
        """Embedding + 2-layer LSTM (reference src/nemo-ggml.cpp:1013-1052)."""
        t, cfg = self.t, self.cfg
        x = t["decoder.prediction.embed.weight"][prev]
        h2, c2 = h.copy(), c.copy()
        for li in range(cfg.decoder_layers):
            sfx = f"decoder.prediction.dec_rnn.lstm.weight_ih_l{li}"
            sfx_h = f"decoder.prediction.dec_rnn.lstm.weight_hh_l{li}"
            b_i = t[f"decoder.prediction.dec_rnn.lstm.bias_ih_l{li}"]
            b_h = t[f"decoder.prediction.dec_rnn.lstm.bias_hh_l{li}"]
            h2[li], c2[li] = ops.lstm_cell(x, h[li], c[li],
                                           t[sfx], t[sfx_h], b_i, b_h)
            x = h2[li]
        return x, h2, c2

    def _joint_logp(self, enc_t, dec_out):
        t = self.t
        e = enc_t @ t["joint.enc.weight"].T + t["joint.enc.bias"]
        d = dec_out @ t["joint.pred.weight"].T + t["joint.pred.bias"]
        hj = np.maximum(e + d, 0.0)
        logits = hj @ t["joint.joint_net.2.weight"].T + t["joint.joint_net.2.bias"]
        return log_softmax(logits.astype(np.float64))

    def decode(self, enc: np.ndarray, beam_size: int,
               expansions: int = MAX_SYMBOLS_PER_STEP,
               max_tokens: int = 10 ** 9) -> Hyp:
        """enc [T, D] -> best Hyp. Mirrors models/beam.py exactly,
        including its non-merging of identical prefixes and its empty-slot
        seeding (one live hypothesis at score 0)."""
        cfg = self.cfg
        blank = cfg.blank_token
        L, H = cfg.decoder_layers, cfg.decoder_dim
        live = [Hyp([], 0.0, np.zeros((L, H), np.float32),
                    np.zeros((L, H), np.float32), blank)]

        for et in enc:
            fin: list[Hyp] = []
            for _round in range(expansions):
                new_live = []
                cands = []  # (score, parent_idx, label, dec_cache)
                for i, hyp in enumerate(live):
                    dec_out, h2, c2 = self._dec_step(hyp.prev, hyp.h, hyp.c)
                    logp = self._joint_logp(et, dec_out)
                    fin.append(Hyp(hyp.tokens, hyp.score + logp[blank],
                                   hyp.h, hyp.c, hyp.prev))
                    for v in range(cfg.vocab_size):
                        if v == blank or len(hyp.tokens) >= max_tokens:
                            continue
                        cands.append((hyp.score + logp[v], i, v, (h2, c2)))
                fin = sorted(fin, key=lambda x: -x.score)[:beam_size]
                cands.sort(key=lambda x: -x[0])
                for score, i, v, (h2, c2) in cands[:beam_size]:
                    new_live.append(Hyp(live[i].tokens + [v], score,
                                        h2, c2, v))
                live = new_live

            # force-finish the survivors
            for hyp in live:
                dec_out, _h2, _c2 = self._dec_step(hyp.prev, hyp.h, hyp.c)
                logp = self._joint_logp(et, dec_out)
                fin.append(Hyp(hyp.tokens, hyp.score + logp[blank],
                               hyp.h, hyp.c, hyp.prev))
            live = sorted(fin, key=lambda x: -x.score)[:beam_size]

        return max(live, key=lambda x: x.score)
