from gsjax.ops.raster.camera import Camera  # noqa: F401
from gsjax.ops.raster.config import RasterConfig  # noqa: F401
from gsjax.ops.raster.api import mark_visible, render  # noqa: F401
