"""FIR low-pass filter design for alias-free resampling.

Kaiser-windowed sinc filters parameterised by cutoff / transition width /
sampling rate, as used by the alias-free StyleGAN3 synthesis network the
reference repo drives through ``G.synthesis``
(``/root/reference/stylegan3_hvae_full.py:274``).  Filters are designed once at
config time with numpy/scipy and baked into the compiled TPU program as
constants.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.signal
import scipy.special


def design_lowpass_filter(
    numtaps: int,
    cutoff: float,
    width: float,
    fs: float,
    radial: bool = False,
) -> Optional[np.ndarray]:
    """Design a 1D (separable) or 2D (radially symmetric) low-pass filter.

    Args:
        numtaps: filter length; ``1`` means identity (returns ``None``).
        cutoff: cutoff frequency in the same units as ``fs``.
        width: transition band width.
        fs: sampling rate of the signal the filter operates on.
        radial: design a 2D jinc filter instead of a separable 1D sinc.

    Returns:
        float32 numpy array of shape ``[numtaps]`` (separable) or
        ``[numtaps, numtaps]`` (radial), or ``None`` for the identity.
    """
    assert numtaps >= 1
    if numtaps == 1:
        return None

    if not radial:
        f = scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff, width=width, fs=fs)
        return np.asarray(f, dtype=np.float32)

    # Radially symmetric jinc: ideal 2D circular low-pass windowed by the same
    # Kaiser window a 1D design with these parameters would use.
    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    with np.errstate(invalid="ignore", divide="ignore"):
        f = scipy.special.j1(2 * cutoff * (np.pi * r)) / (np.pi * r)
    # Limit at r -> 0 of j1(2*pi*c*r)/(pi*r) is c (up to the normalisation
    # below); patch the centre tap to avoid the 0/0.
    f[r == 0] = cutoff
    beta = scipy.signal.kaiser_beta(scipy.signal.kaiser_atten(numtaps, width / (fs / 2)))
    w = np.kaiser(numtaps, beta)
    f *= np.outer(w, w)
    f /= np.sum(f)
    return np.asarray(f, dtype=np.float32)
