from .model import Depthformer
