"""gminer_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-expression of the capabilities of yaobaiwei/GMiner
(EuroSys'18, task-oriented graph mining in C++/MPI — reference at
/root/reference) as idiomatic Spark: DataFrames + Catalyst for the
dataflow, Arrow-vectorized pandas UDFs for per-partition kernels,
shuffles instead of ZMQ vertex pulls, and parquet/Iceberg-style
checkpoints for superstep state.

Subpackages
-----------
graph       edge tables, CSR blocks, superstep framework, PageRank
            (plain / weighted / personalized / warm-start), connected
            components (+ incremental), label propagation (+ weighted),
            triangle count, SSSP, k-core / s-core / coreness, k-truss,
            MIS, betweenness / harmonic / eccentricity, link-prediction
            features, random-walk corpora, k-hop feature aggregation,
            mining kernels (max clique, pattern match, community, FocusCO)
web         Common-Crawl-style pages fixtures, HTML link/text extraction,
            url normalization and edge minting
textops     language id, quality scoring, token counting, fingerprinting,
            dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard)
sim         embedding similarity search (brute-force + LSH-bucketed ANN)
multimodal  opaque-binary column plumbing (decode stubs, real Spark side)
streaming   Structured Streaming over the events table
"""

__version__ = "0.1.0"
