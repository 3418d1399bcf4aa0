"""Graph layer: edge tables, degrees, CSR blocks, superstep algorithms."""
