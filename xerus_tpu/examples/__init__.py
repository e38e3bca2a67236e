from .generators import (laplace_operator, poisson_rhs, peaking_diagonals,
                         random_low_rank, heisenberg_mpo)
from .completion import inverse_index_norm, inverse_index_ratio
from . import cascade
