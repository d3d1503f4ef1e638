from . import blocks
from .blocks import dequantize, quantize, supported_decode, supported_encode
