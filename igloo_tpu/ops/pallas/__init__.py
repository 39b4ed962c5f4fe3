"""Hand-written Pallas/Mosaic TPU kernels for the hot data-plane paths."""
