from ic_gan_tpu.data import ada, augment, datasets, distributions, feature_bank, image_datasets
from ic_gan_tpu.data.datasets import HDF5Dataset, get_dataset_hdf5

__all__ = ["ada", "augment", "datasets", "distributions", "feature_bank",
           "image_datasets", "HDF5Dataset", "get_dataset_hdf5"]
