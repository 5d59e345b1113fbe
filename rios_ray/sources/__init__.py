from .pages import read_pages, read_polygons  # noqa: F401
