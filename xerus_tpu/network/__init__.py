from .network import TensorNetwork, TensorNode, Link
from . import dsl as _dsl  # installs TensorNetwork.assign_indexed
from .heuristics import best_contraction_order
