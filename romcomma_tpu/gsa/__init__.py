from romcomma_tpu.gsa import base, calibrators, models
