"""monortm_tpu: a TPU-native monochromatic radiative-transfer framework.

Re-designed from scratch for JAX/XLA/Pallas with the capabilities of
AER MonoRTM v5.6 (reference mounted read-only; cited as file:line in
docstrings).  See README.md for the architecture overview.
"""

__version__ = "0.1.0"
