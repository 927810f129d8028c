from .images import from_uint8, image_grid, load_image, save_image, to_uint8

__all__ = ["from_uint8", "image_grid", "load_image", "save_image", "to_uint8"]
