"""CLI contract tests: argv parsing, PCM-in / text-out, stats on stderr
(counterpart of the reference's main-binary contract,
src/transcribe_stream.cpp:27-36)."""

import subprocess
import sys
import os

import numpy as np
import pytest

from conftest import tiny_config, write_tiny_gguf
from nemotron_tpu import params as params_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def model_file(tmp_path_factory):
    cfg = tiny_config()
    arrays = params_mod.random_weight_arrays(cfg, seed=0)
    path = str(tmp_path_factory.mktemp("m") / "model.gguf")
    write_tiny_gguf(path, arrays, cfg)
    return path, cfg


def run_cli(script, args, stdin=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # hermetic: never let a test subprocess touch a real accelerator
    # (nemotron_tpu forces this through plugins that ignore the env var)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", script), *args],
        input=stdin, capture_output=True, timeout=300, env=env)


def test_stream_cli_file(model_file, tmp_path):
    path, cfg = model_file
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(17 * 160 * 4) * 8000).astype(np.int16)
    pcm = tmp_path / "a.pcm"
    audio.tofile(pcm)
    r = run_cli("transcribe_stream.py", [path, str(pcm), "170", "0", "--cpu"])
    assert r.returncode == 0, r.stderr.decode()
    assert "chunks" in r.stderr.decode()
    assert "config:" in r.stderr.decode()


def test_stream_cli_stdin(model_file):
    path, cfg = model_file
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(17 * 160 * 3) * 8000).astype(np.int16)
    r = run_cli("transcribe_stream.py", [path, "-", "170", "0", "--cpu"],
                stdin=audio.tobytes())
    assert r.returncode == 0, r.stderr.decode()


def test_batch_cli(model_file, tmp_path):
    path, cfg = model_file
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(16000) * 8000).astype(np.int16)
    pcm = tmp_path / "b.pcm"
    audio.tofile(pcm)
    r = run_cli("transcribe.py", [path, str(pcm), "--cpu"])
    assert r.returncode == 0, r.stderr.decode()
    assert "RTF" in r.stderr.decode()


def test_batch_cli_nbest(model_file, tmp_path):
    """--nbest=N prints N ranked beam hypotheses with scores."""
    path, cfg = model_file
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(16000) * 8000).astype(np.int16)
    pcm = tmp_path / "n.pcm"
    audio.tofile(pcm)
    r = run_cli("transcribe.py", [path, str(pcm), "--cpu", "--nbest=2"])
    assert r.returncode == 0, r.stderr.decode()
    lines = [ln for ln in r.stdout.decode().splitlines() if ln]
    assert len(lines) == 2
    assert lines[0].startswith("[0] score=")
    assert lines[1].startswith("[1] score=")
    r = run_cli("transcribe.py", [path, str(pcm), "--cpu", "--nbest=x"])
    assert r.returncode == 1


def test_cli_usage_error():
    r = run_cli("transcribe_stream.py", [])
    assert r.returncode == 1


def test_wav_decoding(tmp_path):
    """WAV (PCM16 mono/stereo) decodes to the same samples as raw PCM."""
    import struct

    from nemotron_tpu.utils.audio import read_audio_bytes, read_audio_file

    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(1600) * 8000).astype("<i2")

    def wav_bytes(samples, channels=1, rate=16000):
        data = samples.tobytes()
        return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                        rate * 2 * channels, 2 * channels, 16)
                + b"data" + struct.pack("<I", len(data)) + data)

    np.testing.assert_array_equal(read_audio_bytes(wav_bytes(pcm)), pcm)
    # raw passthrough
    np.testing.assert_array_equal(read_audio_bytes(pcm.tobytes()), pcm)
    # stereo downmix
    stereo = np.stack([pcm, pcm], axis=1).reshape(-1)
    np.testing.assert_array_equal(read_audio_bytes(wav_bytes(stereo, 2)), pcm)
    # file helper
    p = str(tmp_path / "a.wav")
    open(p, "wb").write(wav_bytes(pcm))
    np.testing.assert_array_equal(read_audio_file(p), pcm)


def test_wav_resample_and_float(tmp_path):
    """Non-16 kHz and IEEE-float32 WAVs decode directly (the reference
    tells the user to run ffmpeg): length scales by the rate ratio and a
    1 kHz sine survives polyphase resampling; truly unsupported formats
    still raise."""
    import struct

    from nemotron_tpu.utils.audio import read_audio_bytes

    def wav_bytes(raw, channels, rate, fmt, bits):
        block = channels * bits // 8
        return (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, fmt, channels, rate,
                                        rate * block, block, bits)
                + b"data" + struct.pack("<I", len(raw)) + raw)

    def dominant_hz(x, rate=16000):
        spec = np.abs(np.fft.rfft(x.astype(np.float64)))
        return np.argmax(spec[1:]) + 1  # bins of rate/len(x)

    for rate in (8000, 44100, 48000):
        t = np.arange(rate) / rate  # 1 s
        sine = (0.5 * np.sin(2 * np.pi * 1000.0 * t) * 32767).astype("<i2")
        out = read_audio_bytes(wav_bytes(sine.tobytes(), 1, rate, 1, 16))
        assert abs(out.size - 16000) <= 2, (rate, out.size)
        # 1 kHz bin with 1 s of audio = bin 1000
        assert abs(dominant_hz(out) - 1000) <= 1, rate

    # float32 WAV at 16 kHz decodes to the scaled int16 samples
    f = (0.25 * np.sin(2 * np.pi * 440.0 * np.arange(1600) / 16000.0)) \
        .astype("<f4")
    out = read_audio_bytes(wav_bytes(f.tobytes(), 1, 16000, 3, 32))
    np.testing.assert_array_equal(
        out, np.clip(np.round(f * 32767.0), -32768, 32767).astype(np.int16))

    # unsupported: 8-bit PCM
    raw = np.zeros(100, np.uint8).tobytes()
    with pytest.raises(ValueError, match="unsupported WAV"):
        read_audio_bytes(wav_bytes(raw, 1, 16000, 1, 8))


def test_stream_cli_w8a8_sq(model_file, tmp_path):
    """--quantize=w8a8-sq: SmoothQuant calibration on the input clip, then
    W8A8 decode; transcript must match the dense run on this easy fixture."""
    path, cfg = model_file
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(17 * 160 * 4) * 8000).astype(np.int16)
    pcm = tmp_path / "a.pcm"
    audio.tofile(pcm)
    dense = run_cli("transcribe_stream.py", [path, str(pcm), "170", "0",
                                             "--cpu"])
    sq = run_cli("transcribe_stream.py", [path, str(pcm), "170", "0",
                                          "--cpu", "--quantize=w8a8-sq"])
    assert sq.returncode == 0, sq.stderr.decode()
    assert "w8a8-sq (calibrated on" in sq.stderr.decode()
    assert sq.stdout == dense.stdout

    # stdin without --calib must fail with a clean one-line error
    r = run_cli("transcribe_stream.py", [path, "--stdin", "170", "0",
                                         "--cpu", "--quantize=w8a8-sq"],
                stdin=audio.tobytes())
    assert r.returncode == 1
    assert b"--calib" in r.stderr

    # stdin WITH --calib works
    r = run_cli("transcribe_stream.py", [path, "--stdin", "170", "0",
                                         "--cpu", "--quantize=w8a8-sq",
                                         f"--calib={pcm}"],
                stdin=audio.tobytes())
    assert r.returncode == 0, r.stderr.decode()


def test_stream_cli_bad_quantize_mode(model_file, tmp_path):
    path, cfg = model_file
    audio = np.zeros(17 * 160, np.int16)
    pcm = tmp_path / "a.pcm"
    audio.tofile(pcm)
    r = run_cli("transcribe_stream.py", [path, str(pcm), "170", "0",
                                         "--cpu", "--quantize=bogus"])
    assert r.returncode == 1
    assert b"unknown --quantize mode" in r.stderr


def test_stream_cli_w8a8_sq_static(model_file, tmp_path):
    """--quantize=w8a8-sq-static: calibrated static activation scales; the
    transcript must closely track the dense run. (Exact equality is not
    required: static int8 rounds differently from dynamic and random
    weights have near-zero argmax margins — the trained-weights agreement
    harness is the accuracy gate, docs/PERFORMANCE.md.)"""
    import difflib

    path, cfg = model_file
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(17 * 160 * 4) * 8000).astype(np.int16)
    pcm = tmp_path / "a.pcm"
    audio.tofile(pcm)
    dense = run_cli("transcribe_stream.py", [path, str(pcm), "170", "0",
                                             "--cpu"])
    st = run_cli("transcribe_stream.py",
                 [path, str(pcm), "170", "0", "--cpu",
                  "--quantize=w8a8-sq-static"])
    assert st.returncode == 0, st.stderr.decode()
    assert "w8a8-sq-static (calibrated on" in st.stderr.decode()
    assert len(st.stdout) > 0
    # Tripwire, not an accuracy gate: on zero-margin random weights one
    # flipped token perturbs the K/V ring for its whole 70-frame lifetime
    # (measured: a ~20-token block differs, ratio ~0.89), so transcript
    # accuracy is gated on TRAINED weights by scripts/token_agreement.py
    # (100%/99.86% there). A broken static path (all blank / garbage)
    # lands near zero.
    ratio = difflib.SequenceMatcher(
        None, st.stdout, dense.stdout).ratio()
    assert ratio > 0.7, (ratio, st.stdout, dense.stdout)


def test_cli_boost(model_file, tmp_path):
    """--boost=piece:weight biases decoding on both CLIs (suppressing the
    fixture's dominant token changes the transcript); bad specs error."""
    path, cfg = model_file
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(17 * 160 * 3) * 8000).astype(np.int16)
    pcm = tmp_path / "b.pcm"
    audio.tofile(pcm)
    base = run_cli("transcribe_stream.py", [path, str(pcm), "170", "0",
                                            "--cpu"])
    boosted = run_cli("transcribe_stream.py",
                      [path, str(pcm), "170", "0", "--cpu",
                       f"--boost={cfg.blank_token}:50"])
    assert base.returncode == 0 and boosted.returncode == 0
    assert base.stdout.strip() and not boosted.stdout.strip()  # silenced
    bad = run_cli("transcribe.py", [path, str(pcm), "--cpu", "--boost=zz"])
    assert bad.returncode == 1 and b"error" in bad.stderr


def test_stream_cli_ctc(tmp_path):
    """--ctc on the streaming CLI: a dominant-token hybrid head emits
    exactly one piece over a multi-chunk stream (the collapse carry works
    through the CLI path); a model without the head errors cleanly."""
    cfg = tiny_config()
    arrays = params_mod.random_weight_arrays(cfg, seed=0, ctc_head=True)
    arrays = dict(arrays)
    bias = np.zeros(cfg.vocab_size, np.float32)
    bias[5] = 100.0
    arrays["ctc_decoder.decoder_layers.0.bias"] = bias
    path = str(tmp_path / "hybrid.gguf")
    write_tiny_gguf(path, arrays, cfg,
                    vocab=[f"t{i}" for i in range(cfg.vocab_size)])
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(17 * 160 * 4) * 8000).astype(np.int16)
    pcm = tmp_path / "a.pcm"
    audio.tofile(pcm)
    r = run_cli("transcribe_stream.py",
                [path, str(pcm), "170", "0", "--cpu", "--ctc"])
    assert r.returncode == 0, r.stderr.decode()
    assert r.stdout.decode().strip() == "t5"

    plain = str(tmp_path / "plain.gguf")
    write_tiny_gguf(plain, params_mod.random_weight_arrays(cfg, seed=0), cfg)
    r = run_cli("transcribe_stream.py",
                [plain, str(pcm), "170", "0", "--cpu", "--ctc"])
    assert r.returncode == 1
    assert "CTC head" in r.stderr.decode()
