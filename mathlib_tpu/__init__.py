"""mathlib-tpu: a TPU-native pairing-based cryptography framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of IBM/mathlib
(see SURVEY.md): field towers, G1/G2/Gt group operations, optimal-ate
pairings, Pippenger MSM sharded over TPU meshes, hash-to-curve, and
bit-exact mathlib-compatible serialization.
"""

from .curves.params import CurveID, CurveSpec, get_spec  # noqa: F401


def get_batch_engine(spec):
    """Batched TPU engine (lazy import: pulls in jax)."""
    from .batch import get_batch_engine as _g

    return _g(spec)
