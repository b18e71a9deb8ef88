from .show import (KeypointPainter, canvas, image_canvas, heatmap_overlay,
                   draw_limb_offset)

__all__ = ["KeypointPainter", "canvas", "image_canvas", "heatmap_overlay",
           "draw_limb_offset"]
