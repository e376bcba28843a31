from lshm_tpu.data.h5io import (
    scan_files,
    read_metadata,
    read_baseline_channels,
    read_baseline_flat,
    read_baseline_patches,
    read_baselines_patches_batch,
    read_baselines_raw_batch,
    compute_uv,
)
from lshm_tpu.data.device_decode import device_decode_patchify, device_decode_train
from lshm_tpu.data.patches import patchify, patch_grid_shape
from lshm_tpu.data.sampler import (
    DeviceDecodePrefetcher,
    Minibatch,
    MinibatchSampler,
    RawMinibatch,
)
from lshm_tpu.data.synthetic import write_synthetic_h5

__all__ = [
    "scan_files",
    "read_metadata",
    "read_baseline_channels",
    "read_baseline_flat",
    "read_baseline_patches",
    "read_baselines_patches_batch",
    "read_baselines_raw_batch",
    "device_decode_patchify",
    "device_decode_train",
    "compute_uv",
    "patchify",
    "patch_grid_shape",
    "MinibatchSampler",
    "Minibatch",
    "RawMinibatch",
    "DeviceDecodePrefetcher",
    "write_synthetic_h5",
]
