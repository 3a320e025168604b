"""End-to-end tests for the offline tooling scripts (SURVEY.md §2.3)."""

import os
import subprocess
import sys

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def run_script(name, *args, timeout=240):
    # hermetic: never let a test subprocess touch a real accelerator
    # (nemotron_tpu forces this through plugins that ignore the env var)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable, os.path.join(SCRIPTS, name), *args],
                          capture_output=True, text=True, timeout=timeout,
                          env=env)


def save_torch_ckpt(arrays, ckpt_path, tmp_path):
    """torch.save a {name: tensor} ckpt in a SUBPROCESS -- torch must never
    be imported into the pytest process: resident torch destabilizes later
    XLA CPU compiles (the full-suite segfault, VERDICT r3 weak item 1).
    Skips the calling test when torch is unusable."""
    npz_path = str(tmp_path / "_ckpt_arrays.npz")
    np.savez(npz_path, **{n: np.asarray(a) for n, a in arrays.items()})
    mk = subprocess.run(
        [sys.executable, "-c",
         "import sys, numpy as np, torch; d = np.load(sys.argv[1]); "
         "torch.save({k: torch.from_numpy(d[k]) for k in d.files}, "
         "sys.argv[2])", npz_path, str(ckpt_path)],
        capture_output=True, text=True, timeout=240)
    if mk.returncode != 0:
        pytest.skip(f"torch not usable in subprocess: {mk.stderr[-200:]}")


def test_convert_to_gguf_roundtrip(model_setup, tmp_path):
    """torch ckpt (NeMo names) -> convert script -> GGUF -> load_model
    reproduces the same params as building from the raw arrays."""
    arrays, params, cfg = model_setup

    ckpt_path = str(tmp_path / "model_weights.ckpt")
    save_torch_ckpt(arrays, ckpt_path, tmp_path)
    vocab_path = str(tmp_path / "v.vocab")
    with open(vocab_path, "w") as f:
        for i in range(cfg.vocab_size):
            f.write(f"t{i}\t-1.0\n")

    out = str(tmp_path / "model.gguf")
    r = run_script("convert_to_gguf.py", ckpt_path, out, "--vocab", vocab_path)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)

    from nemotron_tpu.params import load_model, params_from_arrays

    loaded, lcfg, vocab = load_model(out)
    assert lcfg.d_model == cfg.d_model and lcfg.n_layers == cfg.n_layers
    assert lcfg.kernel_size == cfg.kernel_size  # inferred, not the stale 31
    assert vocab[3] == "t3"
    want = params_from_arrays(arrays, cfg)
    np.testing.assert_allclose(np.asarray(loaded.layers.ffn1_w1),
                               np.asarray(want.layers.ffn1_w1), atol=0)
    np.testing.assert_allclose(np.asarray(loaded.subsampling.conv0_w),
                               np.asarray(want.subsampling.conv0_w), atol=0)
    np.testing.assert_allclose(np.asarray(loaded.decoder.w_ih),
                               np.asarray(want.decoder.w_ih), atol=0)


def test_convert_to_gguf_quantized(model_setup, tmp_path):
    arrays, _, cfg = model_setup
    ckpt_path = str(tmp_path / "w.ckpt")
    save_torch_ckpt(arrays, ckpt_path, tmp_path)
    out = str(tmp_path / "q8.gguf")
    r = run_script("convert_to_gguf.py", ckpt_path, out, "--quantize", "q8_0")
    assert r.returncode == 0, r.stderr
    assert "quantized q8_0" in r.stderr

    from nemotron_tpu.ops.quant import QTensor
    from nemotron_tpu.params import load_model

    qp, _, _ = load_model(out, keep_quantized=True)
    assert isinstance(qp.layers.ffn1_w1, QTensor)
    # quantized file is meaningfully smaller
    f32 = str(tmp_path / "f.gguf")
    run_script("convert_to_gguf.py", ckpt_path, f32)
    assert os.path.getsize(out) < 0.65 * os.path.getsize(f32)


def test_gen_mel(tmp_path):
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(16000) * 8000).astype("<i2")
    audio_path = str(tmp_path / "a.pcm")
    pcm.tofile(audio_path)
    out = str(tmp_path / "a.mel.bin")
    r = run_script("gen_mel.py", audio_path, out)
    assert r.returncode == 0, r.stderr

    from nemotron_tpu.utils.dump import read_dump

    mel = read_dump(out)
    assert mel.shape[1] == 128 and mel.shape[0] > 90


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    from nemotron_tpu import params as P
    from conftest import tiny_config, write_tiny_gguf

    cfg = tiny_config()
    arrays = P.random_weight_arrays(cfg, seed=0)
    path = str(tmp_path_factory.mktemp("gguf") / "tiny.gguf")
    write_tiny_gguf(path, arrays, cfg)
    return path


def test_compare_layers(tiny_gguf):
    r = run_script("compare_layers.py", tiny_gguf, "--cpu", timeout=400)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "encoder (all layers)" in r.stdout
    assert "DIFF" not in r.stdout


def test_analyze_streaming(tiny_gguf):
    r = run_script("analyze_streaming.py", tiny_gguf)
    assert r.returncode == 0, r.stderr
    assert "PURE_CAUSAL" in r.stdout and "per-stream state" in r.stdout


def test_layer_flamechart(tiny_gguf, tmp_path):
    out = str(tmp_path / "sizes.html")
    r = run_script("layer_flamechart.py", tiny_gguf, out)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)
    assert "tensors" in r.stdout


def test_compare_outputs(tiny_gguf, tmp_path):
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(20000) * 8000).astype("<i2")
    audio = str(tmp_path / "a.pcm")
    pcm.tofile(audio)
    r = run_script("compare_outputs.py", tiny_gguf, audio,
                   "--right-context", "1", "--cpu", timeout=400)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "batch-vs-streaming" in r.stdout


def test_nemo_reference_graceful_without_nemo(tiny_gguf):
    r = run_script("nemo_reference.py", tiny_gguf, "x.pcm")
    assert r.returncode == 3
    assert "not installed" in r.stderr


def test_serve_demo(tiny_gguf, tmp_path):
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(24000) * 8000).astype("<i2")
    audio = str(tmp_path / "s.pcm")
    pcm.tofile(audio)
    r = run_script("serve.py", tiny_gguf, audio, "--streams", "2",
                   "--slots", "2", "--right-context", "1",
                   "--seconds", "2", "--cpu", timeout=400)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "aggregate real-time" in r.stderr
    assert "[slot 0]" in r.stdout


def test_serve_demo_w8a8_sq(tiny_gguf, tmp_path):
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(24000) * 8000).astype("<i2")
    audio = str(tmp_path / "q.pcm")
    pcm.tofile(audio)
    r = run_script("serve.py", tiny_gguf, audio, "--streams", "2",
                   "--slots", "2", "--right-context", "1",
                   "--seconds", "2", "--cpu", "--quantize", "w8a8-sq",
                   timeout=400)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "w8a8-sq: calibrated on" in r.stderr
    assert "aggregate real-time" in r.stderr


def test_serve_demo_mesh(tiny_gguf, tmp_path):
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(24000) * 8000).astype("<i2")
    audio = str(tmp_path / "m.pcm")
    pcm.tofile(audio)
    r = run_script("serve.py", tiny_gguf, audio, "--streams", "2",
                   "--slots", "4", "--right-context", "1",
                   "--seconds", "2", "--mesh", "4", timeout=400)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "aggregate real-time" in r.stderr


def test_run_parity_ladder(tiny_gguf, tmp_path):
    """One-command parity ladder: all stages PASS on the tiny f32 model.
    --reference-dir with no buildable reference binary records a skip
    without failing the ladder (the reference-vs-repo stage is one command
    away the day a checkout + toolchain exist)."""
    empty_ref = str(tmp_path / "refdir")
    os.makedirs(empty_ref)
    r = run_script("run_parity.py", tiny_gguf, "--cpu", "--quick",
                   "--reference-dir", empty_ref, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ALL PASS" in r.stdout
    for stage in ("load", "stages", "greedy", "streaming R=13",
                  "quant q8_0", "quant w8a8", "reference binary"):
        assert stage in r.stdout
    assert "skipped: nemotron-asr.cpp absent" in r.stdout


def test_token_agreement_harness(tmp_path):
    """Accuracy harness runs and reports agreement for every quant config."""
    out = str(tmp_path / "agr.json")
    r = run_script("token_agreement.py", "--seconds", "6", "--seeds", "1",
                   "--streams", "1", "--modes", "13", "--cpu",
                   "--configs", "w8a8-int8kv-bf16",
                   "--blank-bias", "0.3", "--json", out, timeout=1200)
    assert r.returncode == 0, r.stderr
    import json

    d = json.load(open(out))
    assert "R13/w8a8-int8kv-bf16" in d
    for v in d.values():
        assert 0.0 <= v["agreement_pct"] <= 100.0


def test_bench_engine_quick():
    """Engine benchmark --quick: runs both engines end to end on CPU.

    Only the two asserted modes run (the pipelined lockstep variant shares
    its compiled program with plain lockstep and added ~1/3 of the wall
    time), and the bound is generous: under full-suite load on a 1-core
    host this subprocess hit a 900 s timeout while passing standalone."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "bench_engine.py"),
         "--quick", "--ticks", "2", "--modes", "lockstep,engine"],
        capture_output=True, text=True, timeout=1800, env=env)
    assert r.returncode == 0, r.stderr
    import json

    d = json.loads(r.stdout)
    assert any(k.startswith("lockstep/") for k in d)
    assert any(k.startswith("engine/") for k in d)


def test_bench_step_variants_quick():
    """Step-variant benchmark --quick across two latency modes: one JSON
    result per (variant, mode, batch, rc) with sane timing fields."""
    r = run_script("bench_step_variants.py", "--quick", "--rc", "0,13",
                   "--unroll", "1", "--chains", "2", "--len", "2",
                   timeout=900)
    assert r.returncode == 0, r.stderr
    import json

    d = json.loads(r.stdout)
    assert any(k.endswith("/R0") for k in d)            # rc axis present
    assert any("/R" not in k for k in d)                # default R=13 key
    for v in d.values():
        assert v["min_ms"] <= v["p50_ms"] <= v["max_ms"]


def test_debug_conv_layers(tiny_gguf):
    r = run_script("debug_conv_layers.py", tiny_gguf, "--cpu", timeout=400)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "worst stage max_abs" in r.stdout
    assert "DIFF" not in r.stdout


def test_debug_joint_trace(tiny_gguf):
    r = run_script("debug_joint_trace.py", tiny_gguf, "--cpu",
                   "--frames", "4", timeout=400)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "no divergence" in r.stdout


def test_nemo_reference_mock(tmp_path):
    """Exercise scripts/nemo_reference.py's hook wiring, dump naming and
    att-context plumbing against a MOCK nemo package (real torch modules,
    so register_forward_hook fires for real) -- VERDICT r2 item 8: the day
    a machine with nemo_toolkit runs this, the instrumentation must work
    first try. The mock's transcribe() echoes the att context it received
    so the test can assert the [70, R] plumbing end-to-end.

    torch is probed in a SUBPROCESS, never imported into the pytest
    process: torch resident alongside XLA's CPU compiler segfaulted the
    full suite at tests/test_streaming_encoder.py (VERDICT r3 weak item 1;
    two independent full runs crashed at the same backend_compile_and_load
    with torch loaded, and every file passes in isolation). The script
    under test runs in its own interpreter anyway."""
    probe = subprocess.run([sys.executable, "-c", "import torch"],
                           capture_output=True, timeout=120)
    if probe.returncode != 0:
        pytest.skip("torch not importable")
    mock_root = tmp_path / "mockpkg"
    models_dir = mock_root / "nemo" / "collections" / "asr" / "models"
    models_dir.mkdir(parents=True)
    for d in (mock_root / "nemo",
              mock_root / "nemo" / "collections",
              mock_root / "nemo" / "collections" / "asr",
              models_dir):
        (d / "__init__.py").touch()
    (models_dir / "__init__.py").write_text('''
import numpy as np
import torch
import torch.nn as nn


class _Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.pre_encode = nn.Linear(4, 4)
        self.layers = nn.ModuleList([nn.Linear(4, 4) for _ in range(3)])
        self.att_context = None

    def set_default_att_context_size(self, ac):
        self.att_context = list(ac)


class ASRModel(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = _Encoder()

    @classmethod
    def restore_from(cls, path, map_location=None):
        return cls()

    def transcribe(self, audios):
        x = torch.from_numpy(
            np.asarray(audios[0][:24], np.float32).reshape(6, 4))
        h = self.encoder.pre_encode(x)
        for layer in self.encoder.layers:
            h = layer(h)
        return [f"mock att={self.encoder.att_context}"]
''')

    pcm = (np.random.default_rng(0).standard_normal(4000) * 8000
           ).astype("<i2")
    audio = str(tmp_path / "a.pcm")
    pcm.tofile(audio)
    dump_dir = str(tmp_path / "dumps")

    env = dict(os.environ)
    env["PYTHONPATH"] = str(mock_root) + os.pathsep + env.get("PYTHONPATH",
                                                              "")
    env["JAX_PLATFORMS"] = "cpu"   # hermetic subprocess
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "nemo_reference.py"),
         str(tmp_path / "fake.nemo"), audio,
         "--dump-dir", dump_dir, "--right-context", "6"],
        capture_output=True, text=True, timeout=240, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "mock att=[70, 6]" in r.stdout          # att-context plumbing

    from nemotron_tpu.utils.dump import read_dump

    # dump names match StreamSession(trace_dir=...) captures, contents are
    # readable in the reference's 32-byte-header binary format
    names = sorted(os.listdir(dump_dir))
    assert names == ["layer_00_out.bin", "layer_01_out.bin",
                     "layer_02_out.bin", "pre_encode_out.bin"]
    for n in names:
        arr = read_dump(os.path.join(dump_dir, n))
        assert arr.shape == (6, 4) and np.isfinite(arr).all()


def test_beam_quality(tmp_path):
    """beam_quality.py over the committed trained fixture: greedy and
    beam TERs come back sane (< 20% on a short stream) and beam never
    hurts by more than noise."""
    gguf = os.path.join(SCRIPTS, "..", "weights", "tones_tiny.gguf")
    if not os.path.exists(gguf):
        import pytest

        pytest.skip("trained fixture not present")
    out = str(tmp_path / "bq.json")
    r = run_script("beam_quality.py", gguf, "--cpu", "--seconds", "10",
                   "--streams", "2", "--seeds", "1", "--modes", "13",
                   "--beam", "2", "--json", out, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    import json as _json

    res = _json.load(open(out))
    row = res["R13/seed0"]
    assert row["greedy"] < 0.2 and row["beam2"] < 0.2
    assert row["beam2"] <= row["greedy"] + 0.02


def test_asr_server_client_roundtrip(tmp_path):
    """asr_server.py + asr_client.py over loopback TCP on the trained
    fixture: the streamed transcript's token labels must match the tone
    truth (the network path is the trained model's real serving surface).
    In-process protocol coverage lives in tests/test_server.py; this is
    the operator-facing script pair."""
    gguf = os.path.join(SCRIPTS, "..", "weights", "tones_tiny.gguf")
    if not os.path.exists(gguf):
        import pytest

        pytest.skip("trained fixture not present")

    from nemotron_tpu.utils.tones import make_eval_streams

    audio, truths = make_eval_streams(1, 6.0, 16, seed=3)
    pcm = str(tmp_path / "tones.pcm")
    audio[0].tofile(pcm)

    port = 20000 + os.getpid() % 20000
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    srv = subprocess.Popen(
        [sys.executable, os.path.join(SCRIPTS, "asr_server.py"), gguf,
         "--cpu", "--port", str(port), "--slots", "2", "--stats-every", "0",
         "--endpoint-silence", "1.0"],   # flag wiring; relay gated in
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)  # test_server.py
    try:
        line = srv.stderr.readline()  # blocks until the server is bound
        assert "listening" in line, line
        r = run_script("asr_client.py", f"127.0.0.1:{port}", pcm,
                       "--rate", "max", timeout=600)
        assert r.returncode == 0, r.stdout + r.stderr
        # vocab pieces are "▁T<label>": recover the label sequence
        got = [int(w[1:]) for w in r.stdout.split() if w.startswith("T")]
        want = truths[0]
        # a final tone cut at the window boundary may add one trailing token
        assert got[: len(want)] == want, (got, want)
        assert len(got) <= len(want) + 1
    finally:
        srv.terminate()
        srv.wait(30)


def test_bench_cohorts_quick():
    """bench_cohorts.py --quick in both modes: sane JSON, true headroom."""
    import json as _json

    for extra in ([], ["--e2e"]):
        r = run_script("bench_cohorts.py", "--quick", "--rounds", "2",
                       *extra, timeout=600)
        assert r.returncode == 0, r.stdout + r.stderr
        res = _json.loads(r.stdout.strip().splitlines()[-1])
        assert res["streams_total"] == res["cohorts"] * res["batch"]
        assert res["round_p50_ms"] > 0


def test_bench_batch_quick():
    """bench_batch.py --quick: one JSON line per scenario with sane fields
    (the offline batch-mode RTF benchmark, the reference's own headline
    scenario)."""
    import json as _json

    r = run_script("bench_batch.py", "--quick", timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 2
    for ln in lines:
        res = _json.loads(ln)
        assert res["metric"] == "batch_transcribe"
        assert res["device_s"] > 0
        assert res["rtf_end_to_end"] >= res["rtf_device"] > 0
        assert res["audio_s"] == res["batch"] * res["utterance_s"]


def test_emission_delay():
    """emission_delay.py: per-mode JSON with sane ordering (delay grows
    with right context; structural latency matches the config table)."""
    import json as _json

    if not os.path.exists(os.path.join(SCRIPTS, "..", "weights",
                                       "tones_tiny.gguf")):
        import pytest as _pytest

        _pytest.skip("trained fixture not present")
    r = run_script("emission_delay.py", "--seconds", "10", "--streams", "1",
                   "--modes", "0,13", timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    lines = [_json.loads(ln) for ln in r.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 2
    r0, r13 = lines
    assert r0["structural_latency_ms"] == 170      # 17 mel frames
    assert r13["structural_latency_ms"] == 1210    # 121 mel frames
    assert r0["match_rate_vs_truth"] > 0.9
    assert 0 < r0["delay_p50_ms"] < r13["delay_p50_ms"]


def test_hybrid_quality(tmp_path):
    """hybrid_quality.py: decodes both heads of a hybrid checkpoint and
    reports TER for each; refuses a model without a CTC head."""
    import json as _json

    import sys as _sys
    _sys.path.insert(0, os.path.join(SCRIPTS, ".."))
    from conftest import tiny_config
    from nemotron_tpu import params as P

    cfg = tiny_config()
    arrays = P.random_weight_arrays(cfg, seed=0, ctc_head=True)
    params = P.params_from_arrays(arrays, cfg)
    hybrid = str(tmp_path / "h.gguf")
    P.save_model(hybrid, params, cfg,
                 vocab=[f"▁T{i}" for i in range(cfg.vocab_size - 1)]
                 + ["<blank>"])
    r = run_script("hybrid_quality.py", hybrid, "--seconds", "4",
                   "--streams", "1", "--seeds", "1", "--cpu", timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    res = _json.loads(r.stdout.strip().splitlines()[-1])
    assert "rnnt_ter_pct" in res and "ctc_ter_pct" in res
    assert res["truth_tokens"] > 0

    plain = str(tmp_path / "p.gguf")
    P.save_model(plain, P.params_from_arrays(
        P.random_weight_arrays(cfg, seed=1), cfg), cfg)
    r = run_script("hybrid_quality.py", plain, "--cpu", timeout=600)
    assert r.returncode == 1 and "no CTC head" in r.stderr
