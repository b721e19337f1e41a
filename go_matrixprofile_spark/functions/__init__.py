"""Columnar codecs: Gorilla XOR floats + delta-of-delta timestamps."""
