"""TPU-native ops: preprocessing, attention, pooling, and Pallas kernels."""
