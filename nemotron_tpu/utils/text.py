"""SentencePiece detokenization (reference src/nemo-ggml.cpp:1432-1458).

One encoder frame = 8 mel hops = 1280 samples = 80 ms
(reference src/nemo-ggml.h:343-355)."""

from __future__ import annotations

SP_SPACE = "▁"  # ▁
SECONDS_PER_FRAME = 1280.0 / 16000.0


def tokens_to_text(tokens: list[tuple], vocab: list[str],
                   timestamp_words: bool = False,
                   confidence_words: bool = False) -> str:
    """tokens: list of (token_id, frame_index[, log_posterior]).

    confidence_words annotates each word start with `{p=0.93}` -- the word's
    posterior = exp(min log-posterior over its pieces seen so far) from
    greedy_decode's with_confidence output (min over pieces is the standard
    conservative word-confidence aggregate). Like {sec} timestamps, the
    annotation reflects the pieces visible at emission time; a word split
    across streaming chunks is scored from its first chunk's pieces."""
    out = []
    for i, tok in enumerate(tokens):
        token_id, frame = tok[0], tok[1]
        if not (0 <= token_id < len(vocab)):
            continue
        piece = vocab[token_id]
        if piece.startswith(SP_SPACE):
            out.append(" ")
            if timestamp_words:
                out.append(f"{{{frame * SECONDS_PER_FRAME:.2f}}}")
            if confidence_words:
                # min log-posterior over this word's pieces (to the next
                # word start or end of the visible token list)
                lp = None
                for t2 in tokens[i:]:
                    if t2 is not tok and (0 <= t2[0] < len(vocab)
                                          and vocab[t2[0]].startswith(SP_SPACE)):
                        break
                    if len(t2) > 2:
                        lp = t2[2] if lp is None else min(lp, t2[2])
                if lp is not None:
                    import math

                    out.append(f"{{p={math.exp(lp):.2f}}}")
            out.append(piece[len(SP_SPACE):])
        else:
            out.append(piece)
    return "".join(out)


def edit_distance(a, b) -> int:
    """Levenshtein distance between two token sequences (the unit under
    the reference's transcript-match gate, scripts/compare_outputs.py:
    word-level edit distance; here tokens play the word role)."""
    a, b = list(a), list(b)
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]
