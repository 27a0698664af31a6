"""Device DSP ops (jittable; host-side design in `design`)."""
from . import (am, correlate, crc, design, filters, fir, fm, iir, nco,  # noqa: F401
               peaks, peaks_extra, pll, resample)
