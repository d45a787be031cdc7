from mcax.frames import window as window
from mcax.frames import stft as stft
from mcax.frames import ola as ola
from mcax.frames.window import hann, sqrt_hann, cola_error, make_windows
from mcax.frames.ola import overlap_add, streaming_overlap_add
