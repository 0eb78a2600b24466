"""tpu_splat — a TPU-native 3D Gaussian Splatting trainer + renderer in JAX/XLA/Pallas.

Functionally equivalent to MrNeRF/gaussian-splatting-cuda ("LichtFeld Studio"), but designed
TPU-first: pure-functional model state, jit-compiled train step, scan/cumsum-based front-to-back
compositing instead of warp-sequential loops, GSPMD sharding for scale-out.

See SURVEY.md at the repo root for the structural analysis of the reference this build follows.
"""

__version__ = "0.1.0"
