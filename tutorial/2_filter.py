"""Tutorial 2: composing filters with the chainable Stream API
(ref tutorial/2_filter.py).
"""
import sys

from directdemod_tpu.io import sinks, sources
from directdemod_tpu.ops import filters
from directdemod_tpu import constants as K
from directdemod_tpu.stream.api import Stream

file_name = sys.argv[1] if len(sys.argv) > 1 else "IQ.wav"
if file_name == "IQ.wav":
    import os as _os
    sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from _sample import ensure_capture
    ensure_capture(file_name)
src = sources.open_source(file_name)

audio, rate = (Stream(src)
               .shift(30000)                              # move channel to 0 Hz
               .filter(filters.blackman_harris(151))      # FIR noise filter
               .bw_limit(60000)                           # decimate
               .fm_demod()                                # polar discriminator
               .filter(filters.butter(60235, 400, 4400,
                                      kind=K.FLT_BP))     # audio bandpass
               .run())
sinks.write_wav("audio_filtered.wav", rate, audio)
print(f"wrote audio_filtered.wav at {rate} Hz")
