"""Model families: MLP (2D toy), conv ResNet (images), PointNet (3D), style (ALAE)."""

from soft_intro_vae_tpu.models.mlp import DecoderMLP, EncoderMLP
from soft_intro_vae_tpu.models.conv import (
    ConvDecoder,
    ConvEncoder,
    ResidualBlock,
    SoftIntroVAE,
    upsample_nearest_2x,
)
from soft_intro_vae_tpu.models.pointnet import (
    PointNetDecoder,
    PointNetEncoder,
    SoftIntroVAE3D,
)

__all__ = [
    "DecoderMLP",
    "EncoderMLP",
    "ConvDecoder",
    "ConvEncoder",
    "ResidualBlock",
    "SoftIntroVAE",
    "upsample_nearest_2x",
    "PointNetDecoder",
    "PointNetEncoder",
    "SoftIntroVAE3D",
]
