from endosr.nn import networks
from endosr.nn.layers import (
    Conv,
    ConvTranspose,
    Dense,
    WNConv,
    WNConvTranspose,
    instance_norm,
    leaky_relu,
    pixel_shuffle,
)

__all__ = [
    "networks",
    "Conv",
    "ConvTranspose",
    "Dense",
    "WNConv",
    "WNConvTranspose",
    "instance_norm",
    "leaky_relu",
    "pixel_shuffle",
]
