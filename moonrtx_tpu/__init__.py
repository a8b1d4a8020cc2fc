"""moonrtx_tpu — a TPU-native, ray-traced interactive Moon observatory.

A from-scratch rebuild of the capabilities of MoonRTX (reference:
albireo77/moonrtx) designed for TPU hardware:

* the render engine is a JAX/XLA/Pallas ray tracer over an HBM-resident
  mip-mapped LOLA heightfield (replacing the reference's PlotOptiX/OptiX
  CUDA dependency, reference moon_renderer.py:12,433),
* exact terminator shadows are computed by a gather-free cylindrical-radius
  scan in a sun-aligned frame (replacing epsilon-tuned shadow-ray marching,
  reference moon_renderer.py:62-76),
* the ephemeris engine is an original implementation of standard analytic
  series (truncated ELP-style lunar theory, IAU nutation/precession,
  physical libration) replacing the reference's Skyfield/JPL-kernel stack
  (reference astro.py, skyfield_utils.py),
* multi-chip scaling is first-class: image tiles are sharded over a
  jax.sharding.Mesh with shard_map and the framebuffer gathered over ICI.

Subpackages
-----------
astro      ephemeris engine (host, numpy)
data       data ingest, caching, procedural synthesis, mip pyramids
ops        device kernels: windowed MXU sampling, shadow scan, tonemap
engine     scene/camera/light/render pipeline
overlays   selenographic grid, labels, pins (vector font + host compositing)
interact   navigation, picking, measurement
parallel   device mesh and tile sharding
app        CLI, codecs, headless renderer, interactive window, launcher
utils      logging and profiling helpers
"""

__version__ = "0.1.0"

APP_NAME = "MoonRTX-TPU"
