from .tt_kernels import (tt_round_sweep, make_round_sweep, round_flops,
                         make_als_sweep, als_sweep_flops)
