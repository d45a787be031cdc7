"""mcax — a TPU-native multichannel acoustic array framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``jordi-adell/mcarray`` C++ microphone-array stack (mcarray → dspone → wipp;
see SURVEY.md §1a).  Instead of the reference's virtual-method-per-frame
streaming pipeline (dspone ``ShortTimeProcess`` + wipp kernels), mcax processes
whole blocks of audio as batched frame tensors under ``jax.jit``, carries all
streaming state (OLA tails, spatial covariance, trackers) as explicit pytrees,
and scales over TPU meshes with ``shard_map`` + XLA collectives.

Layer map (SURVEY.md §1b):
  kernels/   Pallas TPU kernels (matmul-form rFFT/irFFT, fused CPS+PHAT,
             steering-power matmul) with jnp fallbacks.
  frames/    windowing, framing, STFT/iSTFT, overlap-add.
  algos/     GCC-PHAT, SRP-PHAT, delay-sum, covariance, MVDR, tracking,
             binaural masking.
  dist/      mesh construction, halo exchange, collectives, distributed scan.
  io/        WAV read/write and the streaming block driver.
  cli/       runnable entry points for the 5 acceptance configs.
"""

from mcax import config as config
from mcax import geometry as geometry
from mcax.version import __version__ as __version__


def __getattr__(name):
    # Lazy submodule access (keeps `import mcax` light; jax loads on demand).
    if name in ("pipeline", "state", "kernels", "frames", "algos", "dist",
                "io", "utils", "cli"):
        import importlib
        return importlib.import_module(f"mcax.{name}")
    raise AttributeError(f"module 'mcax' has no attribute {name!r}")
