"""Host-side visualization: tracking overlays, 3D scene export, video.

TPU-native replacement for the reference's Pangolin GUI
(``src/util/VizUtils.{h,cpp}``): the core pipeline stays headless; these
helpers render the same surfaces (tracking overlay VizUtils.cpp:476-579,
3D map/trajectory VizUtils.cpp:167-466) to files — annotated frames,
MP4 video, PLY point clouds, a self-contained HTML 3D viewer, and
matplotlib trajectory plots — instead of an OpenGL window.
"""

from .overlay import draw_tracking  # noqa: F401
from .scene import plot_trajectory, write_html_viewer, write_ply  # noqa: F401
from .video import VideoWriter  # noqa: F401
