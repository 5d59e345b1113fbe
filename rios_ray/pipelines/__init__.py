from .pages import geocoded_pages, spatial_join, flagship, knn_pages  # noqa: F401
