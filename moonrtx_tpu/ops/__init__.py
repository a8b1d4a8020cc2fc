"""Device kernels: windowed sampling, shadow scan."""

from moonrtx_tpu.ops.sampler import (
    gather_bilinear,
    latlon_to_rowcol,
    sample_latlon,
    window_bilinear,
    extract_windows,
)

__all__ = [
    "gather_bilinear", "latlon_to_rowcol", "sample_latlon",
    "window_bilinear", "extract_windows",
]
