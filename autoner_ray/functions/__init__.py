from autoner_ray.functions.text import (  # noqa: F401
    SEPARATORS,
    is_separator_char,
    is_separator_token,
    is_real_separator,
    split_by,
    strip_cpp,
    to_lower_ascii,
    to_upper_ascii,
    is_upper_ascii,
    simple_tokenize,
    simple_tokenize_nonsep,
)
