"""Minimal pywt stand-in for golden-value generation only.

The reference's DWT layers import pywt just to read filter-bank coefficients
(`/root/reference/DWT_IDWT/DWT_IDWT_layer.py:262-264`); pywt is not installed
in this image. This shim exposes `Wavelet(name)` with the standard published
coefficients so the reference code can run on CPU to produce golden test data.
"""
import sys

sys.path.insert(0, "/root/repo")
from tmdiff_tpu.ops.wavelet import FILTER_BANKS


class Wavelet:
    def __init__(self, name):
        bank = FILTER_BANKS[name]
        self.dec_lo = list(bank["dec_lo"])
        self.dec_hi = list(bank["dec_hi"])
        self.rec_lo = list(bank["rec_lo"])
        self.rec_hi = list(bank["rec_hi"])


def wavelist():
    return sorted(FILTER_BANKS.keys())
