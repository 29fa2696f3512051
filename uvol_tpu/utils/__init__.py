from uvol_tpu.utils.paths import (  # noqa: F401
    count_hash_char,
    expand_template,
    get_absolute_url,
    pad,
    pattern_to_glob,
    pattern_to_printf,
)
from uvol_tpu.utils.timing import StageTimer, Timer  # noqa: F401
