"""QR decode/encode + serial extraction (TPU-native rebuild of the
reference client's QR/OCR flow, ``client/src/app/services/qr-ocr.service.ts``).

The reference runs jsQR + Tesseract.js in the browser; here the whole
flow is a server capability: image preprocessing (grayscale, adaptive
binarize) runs as fused JAX ops on the device, the bit-level work
(finder patterns, perspective sampling, Reed-Solomon correction,
segment parsing) is numpy, and the retry-with-SR-enhancement policy
drives the existing Real-ESRGAN engine.
"""

from .qr_decode import decode_qr
from .qr_encode import encode_qr
from .serial import extract_serial, should_retry_with_enhancement

__all__ = [
    "decode_qr",
    "encode_qr",
    "extract_serial",
    "should_retry_with_enhancement",
]
