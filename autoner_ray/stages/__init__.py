from autoner_ray.stages.extract import extract_text_batch  # noqa: F401
from autoner_ray.stages.tokenize import tokenize_pages_batch  # noqa: F401
from autoner_ray.stages.dict_match import DictMatcher  # noqa: F401
