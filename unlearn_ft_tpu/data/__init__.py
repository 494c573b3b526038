from .datasets import get_dataset, CocoCaptions, SyntheticDataset  # noqa: F401
from .loader import DataLoader  # noqa: F401
from .filtering import filter_dataset_by_expert  # noqa: F401
