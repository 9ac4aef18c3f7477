"""Host-side I/O shim: sequence readers, synthetic scenes, visualization.

The thin replacement for the reference's ROS transport layer (SURVEY.md
§2.4 / L0-L1): rosbag/camera topics become sequence readers; RViz topics
become file exports (images, PLY clouds, marker JSON)."""

from .readers import (
    ImageSequence,
    NpzSequence,
    SyntheticStereoSequence,
    read_image,
    read_pgm,
    read_png,
)

__all__ = [
    "ImageSequence",
    "NpzSequence",
    "SyntheticStereoSequence",
    "read_image",
    "read_pgm",
    "read_png",
]
