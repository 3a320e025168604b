from .preprocessor import StreamingPreprocessor, mel_spectrogram  # noqa: F401
