"""TPU-native signal-processing and compute ops (JAX/XLA/Pallas)."""
