from .pyramid import concatenate_pyramids, detach_pyramid  # noqa: F401
from .schedules import adjust_disparity, learning_rate_for_epoch  # noqa: F401
from .viz import (  # noqa: F401
    combine_disparity,
    get_comparison,
    make_grid,
    save_image,
    to_heatmap,
)
