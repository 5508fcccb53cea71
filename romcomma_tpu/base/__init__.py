from romcomma_tpu.base import definitions
from romcomma_tpu.base.classes import Frame, Data, Model

__all__ = ['definitions', 'Frame', 'Data', 'Model']
