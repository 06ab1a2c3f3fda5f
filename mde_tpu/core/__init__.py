from .config import Config, parse, load_config
from .averages import RunningAverage, RunningAverageDict, Timer
from . import metrics
from . import dist
