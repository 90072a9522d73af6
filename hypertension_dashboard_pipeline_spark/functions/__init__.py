"""Expression-level helpers (scalar functions, text analysis, vectors)."""

from .expressions import (  # noqa: F401
    age_from_birth_year,
    flag,
    null_safe_flag,
    recode,
    round_half_even,
    strip_ends,
    trim_chars,
    year_of,
)
