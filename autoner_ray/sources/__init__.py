from autoner_ray.sources.pages import read_pages, derive_pages_batch  # noqa: F401
