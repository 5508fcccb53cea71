from romcomma_tpu.parallel import mesh
