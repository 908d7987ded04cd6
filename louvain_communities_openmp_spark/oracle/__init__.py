"""Sequential reference oracles (pure Python/numpy, no Spark).

These are faithful re-implementations of the *semantics* of the
reference (puzzlef/louvain-communities-openmp) sequential code paths,
used as ground truth in tests and as the exact-mode kernel inside the
engine's single-block ``applyInPandas`` path.
"""

from .graphs import (  # noqa: F401
    adjacency,
    karate,
    power_law,
    ring_of_cliques,
    toy5,
    two_cliques,
    undirected,
)
from .louvain_seq import louvain_seq, modularity  # noqa: F401
from .simple import (  # noqa: F401
    connected_components_seq,
    label_propagation_seq,
    pagerank_seq,
    triangle_count_seq,
)
