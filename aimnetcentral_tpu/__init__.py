"""aimnetcentral_tpu — a TPU-native (JAX/XLA/Pallas) machine-learned interatomic
potential framework with the capabilities of isayevlab/aimnetcentral (AIMNet2).

Design (vs. the PyTorch/CUDA reference):

- ONE canonical tensor layout: flat padded atoms + fixed-shape neighbor
  matrices (``(N, M)`` int32, fill = N-1), replacing the reference's three
  nb-modes (reference aimnet/nbops.py).  Static shapes => one XLA compilation,
  stable across MD frames.
- ONE derivative story: every energy term (NN, Coulomb simple/DSF/Ewald/PME,
  D3 dispersion) is written differentiably in JAX, so forces = ``jax.grad``,
  stress = grad w.r.t. a row-vector strain, Hessians = ``jax.jacfwd(jax.grad)``
  and HVPs = ``jax.jvp`` of grad — exact for every long-range method
  (the reference needs per-method fixed-charge/relaxed-charge workarounds,
  reference aimnet/modules/lr.py:850-901).
- float64 exactness where it matters without paying TPU f64 cost: self-atomic
  energies (SAE) are applied on the host from exact integer element-count
  histograms; the entire jitted graph stays float32.
"""

__version__ = "0.1.0"

from aimnetcentral_tpu import constants  # noqa: F401
