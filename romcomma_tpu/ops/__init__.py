from romcomma_tpu.ops import gram, linalg, transforms, lbfgs
