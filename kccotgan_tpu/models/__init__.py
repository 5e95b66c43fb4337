"""Model family: ConvLSTM encoder pyramid, U-Net decoder, discriminators."""

from .layers import LSTM, Conv2D, ConvLSTM2D, ConvTranspose2D
from .video import VideoDecoder, VideoDiscriminator, VideoEncoder

__all__ = [
    "ConvLSTM2D",
    "LSTM",
    "Conv2D",
    "ConvTranspose2D",
    "VideoEncoder",
    "VideoDecoder",
    "VideoDiscriminator",
]
