"""Headless visualization — file-based viewers.

The reference's ``visualization/`` module is VTK-window based
(pcl::visualization::PCLVisualizer, SURVEY §2.13); a TPU pod has no display,
so the equivalent here is EXPORT: self-contained interactive HTML viewers
(WebGL, no external assets) for clouds and meshes, plus PNG-free ASCII
snapshot rendering for logs/CI. Covers the PCLVisualizer/CloudViewer use
case (inspect a result) in a server environment.
"""

from pcl_tpu.visualization.export import (
    cloud_to_html,
    mesh_to_html,
    render_ascii,
)
from pcl_tpu.visualization.plotter import (
    plot_xy_svg,
    plot_histogram_svg,
    histogram_visualizer_svg,
    range_image_to_pgm,
)
from pcl_tpu.visualization.visualizer import (
    Visualizer,
    KeyboardEvent,
    PointPickingEvent,
    MouseEvent,
)
from pcl_tpu.visualization.live import LiveViewer
