"""SentencePiece detokenization (reference src/nemo-ggml.cpp:1432-1458).

One encoder frame = 8 mel hops = 1280 samples = 80 ms
(reference src/nemo-ggml.h:343-355)."""

from __future__ import annotations

SP_SPACE = "▁"  # ▁
SECONDS_PER_FRAME = 1280.0 / 16000.0


def tokens_to_text(tokens: list[tuple[int, int]], vocab: list[str],
                   timestamp_words: bool = False) -> str:
    """tokens: list of (token_id, frame_index)."""
    out = []
    for token_id, frame in tokens:
        if not (0 <= token_id < len(vocab)):
            continue
        piece = vocab[token_id]
        if piece.startswith(SP_SPACE):
            out.append(" ")
            if timestamp_words:
                out.append(f"{{{frame * SECONDS_PER_FRAME:.2f}}}")
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
