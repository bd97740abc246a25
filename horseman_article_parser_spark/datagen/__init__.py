from .images import build_images_table
from .frontier import build_seed_frontier

__all__ = ["build_images_table", "build_seed_frontier"]
