from .model import NewCRFDepth
