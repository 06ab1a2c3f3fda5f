from .model import UnetAdaptiveBins
