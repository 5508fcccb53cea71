from romcomma_tpu.models import params, gp, kernels, gpr
