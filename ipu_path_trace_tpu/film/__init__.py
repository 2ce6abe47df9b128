from .film import Film, tone_map
from .imageio import write_png, write_exr, read_exr, save_images
