from snvc_tpu.viz.points import (
    BOX_EDGES,
    plot_3d_points,
    plot_lines,
    plot_3d_bbox,
    plot_2d_bbox,
    set_3d_axe_limits,
)
from snvc_tpu.viz.tracebox import TraceBoxRenderer, render_frame, save_image_grid
from snvc_tpu.viz.lidar import (
    TopViewSpec,
    lidar_to_top,
    top_coords,
    top_view_image,
    draw_boxes_on_top,
)
