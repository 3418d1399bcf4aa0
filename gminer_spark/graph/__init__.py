"""Graph layer: edge tables, degrees, CSR blocks, superstep algorithms,
centralities, core decompositions, walks, and mining kernels."""
