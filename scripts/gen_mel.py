#!/usr/bin/env python3
"""Generate a mel-spectrogram fixture from raw PCM (reference
scripts/gen_mel.py): audio -> `<out>.mel.bin` [time, n_mels] f32 in the
project dump format, using the model's own filterbank/window when a GGUF is
given (otherwise the Slaney defaults).

    gen_mel.py <audio.pcm> <out.mel.bin> [model.gguf]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nemotron_tpu.frontend.preprocessor import (  # noqa: E402
    StreamingPreprocessor, hann_window, mel_filterbank_slaney)
from nemotron_tpu.utils.dump import append_dump  # noqa: E402


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__, file=sys.stderr)
        return 1
    audio = np.fromfile(argv[1], dtype="<i2")
    if len(argv) > 3:
        from nemotron_tpu.params import load_model

        params, cfg, _ = load_model(argv[3])
        fb = np.asarray(params.preprocessor.filterbank)
        win = np.asarray(params.preprocessor.window)
    else:
        fb, win = mel_filterbank_slaney(), hann_window(400)

    pre = StreamingPreprocessor(fb, win)
    mel = pre.process(audio)[0]
    if os.path.exists(argv[2]):
        os.unlink(argv[2])
    append_dump(argv[2], mel)
    print(f"{argv[2]}: {mel.shape[0]} frames x {mel.shape[1]} mels "
          f"from {audio.size / 16000.0:.2f}s audio", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
