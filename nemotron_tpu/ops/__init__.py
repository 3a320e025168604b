"""TPU-first compute ops: batched, static-shape, jit/scan-friendly."""
