"""Closed-form completion targets (reference:
src/xerus/examples/tensorCompletion.cpp:32-48)."""

from __future__ import annotations

import math
from typing import Sequence


def inverse_index_norm(position: Sequence[int], additive_const: float = 1.0) -> float:
    norm_sqr = sum((float(i) + additive_const) ** 2 for i in position)
    return 1.0 / math.sqrt(norm_sqr)


def inverse_index_ratio(position: Sequence[int], additive_const: float = 1.0) -> float:
    s = sum((float(position[j]) + 1.0) / (float(position[j + 1]) + additive_const)
            for j in range(len(position) - 1))
    return 1.0 / (additive_const + s)
