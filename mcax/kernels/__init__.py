from mcax.kernels import fft as fft
from mcax.kernels import cps as cps
from mcax.kernels import steer as steer
from mcax.kernels.dispatch import get_backend as get_backend
