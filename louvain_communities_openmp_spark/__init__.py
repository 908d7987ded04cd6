"""PySpark-native link-graph analytics engine.

A brand-new engine with the query capabilities of the reference
(puzzlef/louvain-communities-openmp, GVE-Louvain): Louvain community
detection plus companion PageRank / connected components / label
propagation / triangle counting over an edge DataFrame, along with the
web-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) that a Common-Crawl-style corpus
needs.

Architecture: pure ``pyspark.sql`` DataFrame plans optimized by
Catalyst/AQE; vectorized pandas/Arrow UDFs only where DataFrame
operators cannot express the semantics (the CSR-blocked Louvain
local-move kernel, html link extraction). No RDDs, no per-row Python
UDFs, no custom Catalyst rules.

Package layout
--------------
- ``session``   : SparkSession factory with scale-oriented defaults.
- ``oracle``    : pure-Python sequential reference implementations
                  (faithful port of the reference's *semantics*,
                  cited by file:line) used as test ground truth and as
                  the exact-mode kernel.
- ``sources``   : synthetic pages generator, pages→edges builder,
                  testdata graph derivations, checkpoint/lineage IO.
- ``functions`` : column-expression libraries (text stats, hashing,
                  similarity) and pandas UDFs (extraction).
- ``operators`` : the engine operators (louvain, pagerank, components,
                  labelprop, triangles, transforms, properties, dedup,
                  similarity, multimodal).
- ``plans``     : iterative driver loops, convergence + metrics.
- ``streaming`` : structured-streaming edge-delta ingestion.
"""

__version__ = "0.1.0"
