"""sheep_spark — a PySpark-native link-graph analytics engine.

From-scratch reimplementation of the *capabilities* of dmargo/sheep
(the SHEEP distributed edge partitioner) on idiomatic Spark DataFrames:

- edge-table construction from Common-Crawl-style pages (href extraction)
  or classic edge-list files (SNAP text / XS1 binary),
- degree-ascending vertex sequence (reference: lib/sequence.h:52-63),
- distributed elimination-tree build + associative merge
  (reference: lib/jtree.cpp:34-55, lib/jnode.cpp:174-201),
- first-fit-decreasing balanced tree partitioning
  (reference: lib/partition.cpp:86-157),
- down-edge assignment and exhaustive partition-quality evaluators
  (reference: lib/partition.cpp:428-521),
- iterative analytics on the partitioned graph: PageRank, connected
  components, label propagation, triangle counting — with checkpointed,
  resumable supersteps,
- training-data pipeline operators: exact/MinHash-LSH/Jaccard dedup,
  language id, quality scoring, token stats, fingerprinting, and
  approximate nearest-neighbor search over embeddings.

Architecture is Spark-first: declarative DataFrame plans wherever the
semantics allow (Catalyst handles pushdown/broadcast/AQE), dropping to
Arrow-vectorized kernels only for the union-find tree construction.
"""

__version__ = "0.1.0"
