from .splits import DatasetSpec, dataset_spec, parse_split_line, load_split
from .dataset import DepthDataset
from .loader import DataLoader
from .augment import device_augment_batch, normalize_images
