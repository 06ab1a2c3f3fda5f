from .loss import silog_loss, sog_loss, chamfer_bin_loss, DepthLoss
from .optim import build_optimizer, build_lr_schedule
