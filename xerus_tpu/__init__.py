"""xerus_tpu — a TPU-native library for higher-order tensors, Tensor-Train /
MPS decompositions and general tensor networks.

Ground-up JAX/XLA re-design with the capabilities of the reference C++
library xerus v3.0.1 (YiZhiXiaoGuLI/xerus): indexed expressions with lazy
evaluation and cached contraction paths, dense + sparse tensors, generic
tensor networks, TT/MPS with canonicalization and rounding, and optimization
algorithms (ALS/DMRG/ASD, ADF completion, Riemannian CG/SD, IHT, ...).
"""

from . import config as _config_module
from .config import config, EPSILON, set_value_dtype, value_dtype

from .core import (Tensor, Representation, Initialisation, reshuffle,
                   entrywise_product, approx_equal, approx_entrywise_equal,
                   contract, calculate_svd, calculate_qr, calculate_rq,
                   calculate_qc, calculate_cq, pseudo_inverse, solve,
                   solve_least_squares)
from .indexing import Index, indices, SVD, QR, RQ, QC, CQ
from .network import TensorNetwork
from .misc import (FileFormat, save_to_file, load_from_file, LogHistogram,
                   set_seed)
from .core import serialization as _serialization  # registers Tensor I/O

from .core.tensor import Tensor as _T


def frob_norm(x) -> float:
    return x.frob_norm()


def one_norm(x) -> float:
    return x.one_norm()


__version__ = "0.1.0"
