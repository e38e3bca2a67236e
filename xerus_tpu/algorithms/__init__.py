from .performance_data import PerformanceData, NoPerfData, DataPoint
from .als import (ALSVariant, ALS, ALS_SPD, DMRG, DMRG_SPD, ASD, ASD_SPD)
