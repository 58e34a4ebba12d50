"""Data layer: host-side uint8 pipeline feeding the device.

Design (BASELINE.json:5): the `.npy` sequence loader becomes a host-side
double-buffered feed; uint8->f32 normalize/binarize is fused on-device inside
the jitted train step (`mmvae_tpu.data.transforms`), never materialized on host.
"""

from mmvae_tpu.data.loader import MovingMNIST, generate_moving_mnist, load_or_generate
from mmvae_tpu.data.feed import DeviceFeed, prefetch_to_device
from mmvae_tpu.data.transforms import normalize, binarize, preprocess

__all__ = [
    "MovingMNIST",
    "generate_moving_mnist",
    "load_or_generate",
    "DeviceFeed",
    "prefetch_to_device",
    "normalize",
    "binarize",
    "preprocess",
]
