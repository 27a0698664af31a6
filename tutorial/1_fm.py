"""Tutorial 1: basic FM decode (the reference ladder's first rung,
ref tutorial/1_fm.py).

Open an IQ capture, demodulate one FM channel, write the audio.
"""
import sys

from directdemod_tpu.io import sinks, sources
from directdemod_tpu.models.fm import FmDecoder

file_name = sys.argv[1] if len(sys.argv) > 1 else "IQ.wav"
if file_name == "IQ.wav":
    import os as _os
    sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from _sample import ensure_capture
    ensure_capture(file_name)

src = sources.open_source(file_name)
decoder = FmDecoder(src, offset=30000, bw=30000, audio_freq=15000)
audio, rate = decoder.get_audio()
sinks.write_wav("audio.wav", rate, audio)
print(f"wrote audio.wav: {len(audio)} samples at {rate} Hz")
