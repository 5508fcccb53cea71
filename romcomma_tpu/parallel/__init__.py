from romcomma_tpu.parallel import mesh
from romcomma_tpu.parallel import multihost
