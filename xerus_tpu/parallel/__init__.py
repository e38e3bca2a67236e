from .mesh import default_mesh, measurement_sharding, replicated
from .sharded_ops import (sharded_adf_gradient, sharded_als_local_solve,
                          sharded_tt_inner, multichip_training_step)
from .tsqr_round import tt_round_tsqr
from .tp_als import tp_als_half_sweep, tp_als_solve
