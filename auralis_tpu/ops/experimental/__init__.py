"""Experimental Pallas kernels: numerically verified, measured, and kept OFF
the serving path because the dense XLA programs beat them at XTTSv2's
1047-token sequence ceiling (see ARCHITECTURE.md "Decode performance notes"
for the numbers). They exist as working starting points for longer-context
models where per-slot raggedness starts paying (~4k+ tokens).
"""
