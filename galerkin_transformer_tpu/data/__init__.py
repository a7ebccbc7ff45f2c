from .normalizer import UnitGaussianNormalizer
from .loader import DataLoader
from .burgers import BurgersDataset
from .darcy import DarcyDataset
from .ns import NavierStokesDatasetLite

__all__ = ["UnitGaussianNormalizer", "DataLoader", "BurgersDataset",
           "DarcyDataset", "NavierStokesDatasetLite"]
