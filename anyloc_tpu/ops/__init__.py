"""Core TPU-native math ops: VLAD, k-means, GeM, pooling, retrieval, PCA."""
