from euler_tpu.datasets.registry import get_dataset
from euler_tpu.datasets.synthetic import MotifDataset, SBMDataset
