"""Expression library: vectorized detectors, SURT, hashing, text analysis."""
