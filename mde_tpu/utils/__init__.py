from .visualize import colorize
from .wandb_utils import set_wandb
