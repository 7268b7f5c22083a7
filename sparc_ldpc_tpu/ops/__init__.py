"""L1/L2 TPU kernels and matrix-free operators (SURVEY.md §1).

- fwht:      MXU-native fast Walsh-Hadamard transform (mode contractions)
             + Pallas fused kernel.
- dct:       orthonormal DCT-II/III pair (XLA FFT path).
- operators: batched forward/adjoint matvec pairs (dense / partial-Hadamard
             / subsampled-DCT), derived from design.codebook plans.
- denoiser:  sectionwise posterior-mean softmax (Pallas + jnp reference).
- bp:        padded edge-array LDPC belief propagation.
"""

from .operators import make_operator, BatchedOperator  # noqa: F401
from .fwht import fwht_mxu, hadamard_factor  # noqa: F401
from .denoiser import denoise  # noqa: F401
