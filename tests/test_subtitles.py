"""Subtitle export (utils/subtitles.py): word grouping from timed tokens,
cue segmentation (gap / duration / line-length splits, lead-out clipping),
SRT / WebVTT formatting, and the CLI flags.

Beyond the reference, which stops at per-token {sec} timestamps
(src/nemo-ggml.h:343-355)."""

import numpy as np
import pytest

from nemotron_tpu.utils.subtitles import (format_srt, format_vtt,
                                          tokens_to_cues, tokens_to_words,
                                          write_subtitles)
from nemotron_tpu.utils.text import SECONDS_PER_FRAME

SP = "▁"
VOCAB = [SP + "hi", SP + "the", "re", "x", SP + "ok", SP + "a"]


def frames(sec: float) -> int:
    return round(sec / SECONDS_PER_FRAME)


def test_word_grouping():
    toks = [(0, 0), (1, frames(0.4)), (2, frames(0.48))]
    words = tokens_to_words(toks, VOCAB)
    assert [w[2] for w in words] == ["hi", "there"]
    assert words[0][0] == 0.0
    assert words[0][1] == pytest.approx(SECONDS_PER_FRAME)
    assert words[1][0] == pytest.approx(0.4, abs=0.02)
    # word end = last piece's frame + one frame width
    assert words[1][1] == pytest.approx(0.48 + SECONDS_PER_FRAME, abs=0.02)


def test_word_grouping_skips_bad_ids_and_leading_continuation():
    # out-of-range ids are dropped (tokens_to_text parity); a continuation
    # piece with no preceding word start still begins a word
    toks = [(99, 0), (2, 1), (0, 5)]
    words = tokens_to_words(toks, VOCAB)
    assert [w[2] for w in words] == ["re", "hi"]


def test_confidence_triples_accepted():
    toks = [(0, 0, -0.1), (4, 10, -0.2)]
    assert [w[2] for w in tokens_to_words(toks, VOCAB)] == ["hi", "ok"]


def test_gap_split():
    toks = [(0, 0), (4, frames(0.5)), (0, frames(3.0))]
    cues = tokens_to_cues(toks, VOCAB, max_gap_s=1.0)
    assert [c[2] for c in cues] == ["hi ok", "hi"]
    # lead-out: first cue extends 0.5 s past its last word's end (gap is
    # large enough that the next cue's start doesn't clip it)
    last_end = frames(0.5) * SECONDS_PER_FRAME + SECONDS_PER_FRAME
    assert cues[0][1] == pytest.approx(last_end + 0.5)
    assert cues[1][0] == pytest.approx(frames(3.0) * SECONDS_PER_FRAME)


def test_lead_out_clipped_at_next_cue():
    # gap 0.32 s with max_gap 0.2: split, and the 0.5 s lead-out would
    # cross the next cue's start -> clipped to it
    toks = [(0, 0), (4, frames(SECONDS_PER_FRAME + 0.32))]
    cues = tokens_to_cues(toks, VOCAB, max_gap_s=0.2, tail_s=0.5)
    assert len(cues) == 2
    assert cues[0][1] == pytest.approx(cues[1][0])


def test_duration_split():
    # one word every 0.8 s for 10 s: no gap ever exceeds 1 s, but cues are
    # capped at max_dur_s=6
    toks = [(0, frames(0.8 * i)) for i in range(13)]
    cues = tokens_to_cues(toks, VOCAB, max_dur_s=6.0)
    assert len(cues) >= 2
    assert all(c[1] - c[0] <= 6.0 + 0.5 for c in cues)
    assert sum(len(c[2].split()) for c in cues) == 13


def test_char_split():
    toks = [(5, frames(0.2 * i)) for i in range(10)]  # ten 1-char words
    cues = tokens_to_cues(toks, VOCAB, max_chars=7)
    # "a a a a" is 7 chars -> 4 words per cue
    assert [c[2] for c in cues] == ["a a a a", "a a a a", "a a"]


def test_words_to_cues_json_shapes():
    # server events deliver words as JSON lists (not tuples); ints for
    # whole-second times must coerce cleanly
    from nemotron_tpu.utils.subtitles import words_to_cues

    cues = words_to_cues([[0, 1, "hi"], [1.2, 2, "there"]])
    assert len(cues) == 1 and cues[0][2] == "hi there"


def test_srt_format_exact():
    cues = [(0.0, 1.5, "hi there"), (3661.25, 3662.0, "ok")]
    srt = format_srt(cues)
    assert srt == ("1\n00:00:00,000 --> 00:00:01,500\nhi there\n\n"
                   "2\n01:01:01,250 --> 01:01:02,000\nok\n")


def test_vtt_format_exact():
    cues = [(0.08, 1.0, "hi")]
    assert format_vtt(cues) == \
        "WEBVTT\n\n00:00:00.080 --> 00:00:01.000\nhi\n"


def test_write_subtitles(tmp_path):
    toks = [(0, 0), (4, 5)]
    p = tmp_path / "out.srt"
    assert write_subtitles(str(p), toks, VOCAB, "srt") == 1
    assert "-->" in p.read_text()
    v = tmp_path / "out.vtt"
    assert write_subtitles(str(v), toks, VOCAB, "vtt") == 1
    assert v.read_text().startswith("WEBVTT")
    with pytest.raises(ValueError):
        write_subtitles(str(p), toks, VOCAB, "ass")


def test_empty_tokens(tmp_path):
    p = tmp_path / "e.vtt"
    assert write_subtitles(str(p), [], VOCAB, "vtt") == 0
    assert p.read_text() == "WEBVTT\n"
    s = tmp_path / "e.srt"
    assert write_subtitles(str(s), [], VOCAB, "srt") == 0
    assert s.read_text() == ""


# ---- CLI integration (subprocess, tiny random model, CPU) ----------------

def _fixture_audio(tmp_path, n=16000):
    rng = np.random.default_rng(7)
    audio = (rng.standard_normal(n) * 8000).astype(np.int16)
    pcm = tmp_path / "a.pcm"
    audio.tofile(pcm)
    return pcm


def test_batch_cli_srt(tmp_path, tmp_path_factory):
    from test_cli import model_file as _  # noqa: F401 (fixture source)
    from test_cli import run_cli
    from conftest import tiny_config, write_tiny_gguf
    from nemotron_tpu import params as params_mod

    cfg = tiny_config()
    arrays = params_mod.random_weight_arrays(cfg, seed=0)
    path = str(tmp_path / "model.gguf")
    write_tiny_gguf(path, arrays, cfg)
    pcm = _fixture_audio(tmp_path)
    r = run_cli("transcribe.py", [path, str(pcm), "--cpu", "--srt"])
    assert r.returncode == 0, r.stderr.decode()
    srt = tmp_path / "a.srt"
    assert srt.exists()
    body = srt.read_text()
    if "cues to" in r.stderr.decode() and body:
        assert " --> " in body

    # subtitles need greedy frame alignment
    bad = run_cli("transcribe.py", [path, str(pcm), "--cpu", "--srt",
                                    "--beam=2"])
    assert bad.returncode == 1
    assert b"greedy" in bad.stderr


def test_stream_cli_vtt(tmp_path):
    from test_cli import run_cli
    from conftest import tiny_config, write_tiny_gguf
    from nemotron_tpu import params as params_mod

    cfg = tiny_config()
    arrays = params_mod.random_weight_arrays(cfg, seed=0)
    path = str(tmp_path / "model.gguf")
    write_tiny_gguf(path, arrays, cfg)
    pcm = _fixture_audio(tmp_path, n=17 * 160 * 4)
    out = tmp_path / "s.vtt"
    r = run_cli("transcribe_stream.py",
                [path, str(pcm), "170", "0", "--cpu", f"--vtt={out}"])
    assert r.returncode == 0, r.stderr.decode()
    assert out.read_text().startswith("WEBVTT")

    # bare --srt (no =FILE) is an error on the streaming CLI
    bad = run_cli("transcribe_stream.py",
                  [path, str(pcm), "170", "0", "--cpu", "--srt"])
    assert bad.returncode == 1
    assert b"FILE" in bad.stderr
