"""Model forward passes: encoder (batch + streaming) and RNN-T decode."""
