from .performance_data import PerformanceData, NoPerfData, DataPoint
from .als import (ALSVariant, ALS, ALS_SPD, ALS_SPD_CG, DMRG, DMRG_SPD, ASD, ASD_SPD)
from .measurements import SinglePointMeasurementSet, RankOneMeasurementSet
from .adf import ADFVariant, ADF
from .retractions import (TTTangentVector, HOSVDRetractionI, HOSVDRetractionII,
                          ALSRetractionI, ALSRetractionII,
                          SubmanifoldRetractionI, SubmanifoldRetractionII,
                          ProjectiveVectorTransport, TTRetractionI,
                          TTRetractionII, TTVectorTransport)
from .steepest_descent import SteepestDescentVariant, SteepestDescent, line_search
from .cg import GeometricCGVariant, GeometricCG
from .iht import IHT
from .decomposition_als import decomposition_als
from .largest_entry import find_largest_entry
from .uq_adf import (UQMeasurementSet, uq_adf, uq_avg, uq_mc,
                     randvar_to_position)
from .eigensolver import (EigenALSVariant, DMRG_groundstate, ALS_groundstate,
                          smallest_eigenvalue)


def als_spd_mixed(A, x, b, num_half_sweeps: int = 6):
    """Mixed-precision (double-word f32) SPD ALS: float64-quality residuals
    on TPU without float64 compute (ops/mixed_precision.py).  Returns the
    solution as a TTTensor built from the refined cores."""
    from ..ops.mixed_precision import als_spd_mixed as _impl
    from ..tt.ttnetwork import TTTensor
    from ..core.tensor import Tensor
    cores = _impl(A, x, b, num_half_sweeps)
    return TTTensor._make([Tensor.from_ndarray(c) for c in cores])
