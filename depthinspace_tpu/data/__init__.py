from .settings import Settings, load_settings, save_settings
from .dataset import TrackDataset, DataLoader, Batch, collate
from .fixture import generate_dataset, make_dot_pattern
