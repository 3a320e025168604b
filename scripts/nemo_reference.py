#!/usr/bin/env python3
"""NeMo ground-truth runner + instrumentation (the reference's
scripts/my_streaming.py role): run NVIDIA NeMo's own cache-aware streaming
inference on an audio file and dump per-module tensors in this project's
binary dump format, so scripts/compare_tensors.py can diff NeMo against this
framework's `StreamSession(trace_dir=...)` captures.

    nemo_reference.py <model.nemo> <audio.wav|pcm> [--dump-dir DIR]
                      [--right-context R]

Requires the `nemo_toolkit` package (NOT installed in the CI image -- this
tool is for offline parity work on a machine with NeMo; it exits cleanly
with a message otherwise).

CAVEAT: this script has been exercised only against the mock NeMo in
tests/test_nemo_reference.py (the real toolkit is absent from this
environment). It targets the cache-aware streaming API of nemo_toolkit
>= 1.20 (`ASRModel.restore_from`, `encoder.set_default_att_context_size`,
per-layer/pre_encode `register_forward_hook`, `model.transcribe`);
validate those attribute names against your installed version before
trusting the dumps. The reference's scripts/my_streaming.py ran against
the real toolkit.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nemotron_tpu.utils.dump import DumpTracer  # noqa: E402


def main(argv: list[str]) -> int:
    try:
        import torch  # noqa: F401
        from nemo.collections.asr.models import ASRModel
    except ImportError:
        print("nemo_toolkit is not installed; this tool runs NeMo as the "
              "ground truth on a machine that has it.", file=sys.stderr)
        return 3

    args = [a for a in argv[1:] if not a.startswith("--")]
    if len(args) < 2:
        print(__doc__, file=sys.stderr)
        return 1
    dump_dir = "nemo_dumps"
    if "--dump-dir" in argv:
        dump_dir = argv[argv.index("--dump-dir") + 1]
    R = 13
    if "--right-context" in argv:
        R = int(argv[argv.index("--right-context") + 1])

    import torch

    tracer = DumpTracer(dump_dir)
    model = ASRModel.restore_from(args[0], map_location="cpu")
    model.eval()
    model.encoder.set_default_att_context_size([70, R])

    # instrument every encoder layer output (forward hooks -> dump files
    # named like StreamSession's trace_dir captures)
    def hook(name):
        def fn(_mod, _inp, out):
            t = out[0] if isinstance(out, tuple) else out
            tracer(name, t.detach().float().numpy())
        return fn

    for i, layer in enumerate(model.encoder.layers):
        layer.register_forward_hook(hook(f"layer_{i:02d}_out"))
    model.encoder.pre_encode.register_forward_hook(hook("pre_encode_out"))

    if args[1].endswith(".pcm"):
        audio = np.fromfile(args[1], dtype="<i2").astype(np.float32) / 32768.0
    else:
        import soundfile as sf

        audio, sr = sf.read(args[1], dtype="float32")
        assert sr == 16000, f"expected 16 kHz, got {sr}"

    with torch.no_grad():
        text = model.transcribe([audio])[0]
    text = getattr(text, "text", text)
    print(text)
    print(f"dumps written to {dump_dir}/ -- diff against a "
          f"StreamSession(trace_dir=...) run with scripts/compare_tensors.py",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
