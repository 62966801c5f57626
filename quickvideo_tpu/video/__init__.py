"""Video decode + preprocessing (L1): QuickDecoder-equivalent C++ engine,
frame sampling/resize policy, patchify, and the streaming overlap pipeline."""
